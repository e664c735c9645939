"""CLI for poke data collection (reference collectdataPoke.py:409-434).

Collect poke data for one object — here against the C++ firmware simulators
and the simulated PR2, producing raw pickles with the real schema.
"""

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Collecting data from a spinning platter of objects.")
    parser.add_argument("-n", "--name", required=True, help="Object name")
    parser.add_argument("-s", "--seqs", type=int, required=True,
                        help="Data collection sequences (pokes) per objects")
    parser.add_argument("-f", "--flat", action="store_true")
    parser.add_argument("-qf", "--quarterflat", action="store_true")
    parser.add_argument("-v", "--vertmove", action="store_true")
    parser.add_argument("-ro", "--rotateonce", action="store_true")
    parser.add_argument("-nr", "--neverrotate", action="store_true")
    parser.add_argument("-cs", "--curvedsurface", action="store_true")
    parser.add_argument("-w", "--width", type=float, default=0.0)
    parser.add_argument("-l", "--length", type=float, default=0.0)
    parser.add_argument("-ht", "--height", type=float, default=0.0)
    parser.add_argument("-hto", "--heightoffset", type=float, default=0.0)
    parser.add_argument("-iw", "--initwidth", type=float, default=0.0)
    parser.add_argument("-sc", "--startcount", type=int, default=0)
    parser.add_argument("-sim", "--simulation", action="store_true")
    parser.add_argument("-hndl", "--handle", action="store_true")
    # sim-stack extensions
    parser.add_argument("--material", default="plastic",
                        help="Simulated object material")
    parser.add_argument("--timescale", type=float, default=20.0,
                        help="Simulation speed multiplier")
    parser.add_argument("--data-dir", default="data_raw")
    parser.add_argument("--classifier", default=None, metavar="CKPT",
                        help="serve.MaterialClassifier checkpoint: classify "
                        "each poke online and publish the prediction on "
                        "/semihaptics/prediction")
    parser.add_argument("--gains", default="active",
                        help="Arm gain profile: grasp | original | active "
                        "(the change_gains_pr2.sh symlink) | path (C17)")
    parser.add_argument("--no-camera", action="store_true",
                        help="Do not start the sim Kinect; objectImage is "
                        "saved as None like a camera-less session")
    parser.add_argument("--per-poke-images", action="store_true",
                        help="Also grab an image per poke into 'images' "
                        "(the reference's commented-out grab, :366)")
    args = parser.parse_args(argv)

    from mrgan_tpu.acquisition import collect, controller, publishers, serialdev
    from mrgan_tpu.acquisition.bus import BusServer, SimClock

    classifier = None
    if args.classifier:
        from mrgan_tpu.serve import MaterialClassifier

        classifier = MaterialClassifier.load(args.classifier)

    clock = SimClock(args.timescale)
    server = BusServer()
    thermal = serialdev.setup_serial(
        serialdev.thermal_sim_argv(timescale=args.timescale))
    # keep the wall line rate within what the reader sustains (~25k lines/s)
    mic_rate = min(4000.0, 25000.0 / args.timescale)
    mic = serialdev.setup_serial(
        serialdev.contactmic_sim_argv(timescale=args.timescale,
                                      rate=mic_rate))

    temp_pub = publishers.TemperaturePublisher(server.address, clock, thermal)
    mic_pub = publishers.ContactMicPublisher(server.address, clock, mic)
    temp_pub.start()
    mic_pub.start()
    camera = None
    if not args.no_camera:
        camera = publishers.CameraPublisher(server.address, clock,
                                            object_name=args.name,
                                            material=args.material)
        camera.start()

    world = controller.SimWorld(server.address, clock, thermal, mic,
                                material=args.material,
                                axis=2 if args.vertmove else 1)
    world.start()
    control = controller.SimController(vertical_movement=args.vertmove,
                                       world=world, clock=clock,
                                       gain_profile=args.gains)

    collector = collect.CollectData(
        args.name, server.address, clock, control,
        sequences_per_object=args.seqs, start_count=args.startcount,
        vertical_movement=args.vertmove, data_dir=args.data_dir, verbose=True,
        flat=args.flat, quarterflat=args.quarterflat,
        rotateonce=args.rotateonce, handle=args.handle,
        neverrotate=args.neverrotate, classifier=classifier,
        capture_images=not args.no_camera,
        per_poke_images=args.per_poke_images,
        width=args.width, length=args.length, height=args.height,
        height_offset=args.heightoffset, init_width=args.initwidth,
        curvedsurface=args.curvedsurface)
    try:
        saved = collector.performInteraction(rng=np.random)
        print("Saved:", saved)
    finally:
        world.stop()
        temp_pub.close()
        mic_pub.close()
        if camera is not None:
            camera.close()
        server.close()


if __name__ == "__main__":
    main()
