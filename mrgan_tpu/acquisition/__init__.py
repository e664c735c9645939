"""Data-acquisition stack (reference datacollection/, SURVEY.md C12-C17).

The reference runs on a PR2 with ROS pub/sub, two Teensy boards on serial,
and actionlib arm controllers. Rebuilt here as:

- ``bus``         lightweight TCP JSON-line pub/sub replacing the ROS topic
                  graph (/semihaptics/{temperature,contactmic,datastate,
                  collisiontime} + PR2 sensor topics);
- ``serialdev``   pipe-backed serial device talking to the C++ firmware
                  simulators in native/ (thermal_sim, contactmic_sim);
- ``publishers``  the temperature / contact-mic publisher state machines
                  (zeroing/start/record/stop, 'H' hold on contact, bulk
                  replay) mirroring datacollection/publishers/*.py;
- ``controller``  simulated PR2 arm + fingertip sensor streams + the contact
                  physics that couples pokes into both firmware sims;
- ``collect``     the CollectData orchestrator (poke state machine, batch
                  saves, --startcount resume) mirroring collectdataPoke.py.

Everything runs against a scalable sim clock so a full multi-poke collection
executes in seconds in CI and produces raw pickles that flow through
processdata -> dataset -> tables unchanged.
"""
