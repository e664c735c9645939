#!/usr/bin/env python3
"""Entry point preserving the reference CLI: python paperplotly.py.

Regenerates the paper figures (reference paperplotly.py): accuracy curves for
Tables 1/5 (published numbers by default, or --checkpoint to plot a sweep you
ran), and sample trace/spectrogram figures from processed data.
"""

from mrgan_tpu.cli.plots import main

if __name__ == "__main__":
    main()
