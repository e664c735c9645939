#!/usr/bin/env python3
"""Entry point preserving the reference CLI (collectdataPoke.py:409-434):
collect poke data for one object — here against the C++ firmware simulators
and the simulated PR2, producing raw pickles with the real schema.
"""

from mrgan_tpu.cli.collect import main

if __name__ == "__main__":
    main()
