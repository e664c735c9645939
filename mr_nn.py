#!/usr/bin/env python3
"""Entry point preserving the reference CLI: python mr_nn.py --tables 2 4.

Supervised MLP baseline table sweeps (reference mr_nn.py:121-169).
"""

from mrgan_tpu.cli.tables import nn_main

if __name__ == "__main__":
    nn_main()
