#!/usr/bin/env python3
"""Entry point preserving the reference CLI: python processdata.py.

Raw acquisition pickles -> processed MREO pickles over the 14 window configs
(reference processdata.py:10-92), executed as batched on-device gather+lerp
kernels instead of ~400k serial scipy interp1d calls.
"""

from mrgan_tpu.cli.preprocess import main

if __name__ == "__main__":
    main()
