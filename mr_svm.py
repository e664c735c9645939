#!/usr/bin/env python3
"""Entry point preserving the reference CLI: python mr_svm.py --tables 2 4.

RBF-SVM baseline table sweeps (reference mr_svm.py:118-166); Gram matrices on
device, libsvm dual solve on host.
"""

from mrgan_tpu.cli.tables import svm_main

if __name__ == "__main__":
    svm_main()
