#!/usr/bin/env python3
"""Entry point preserving the reference CLI:
python wganlpctsemi.py -t 0 -a iwgan [-v]  (others/wganlpctsemi.py:510-796).

Grid-search harness over the variant algorithm zoo (svm / nn / lstm / rf /
gan / ganlstm / iwgan / iwganlstm) with k-fold CV on the haptic
force+temperature features. Unlike the reference's enforced single-threaded
determinism (wganlpctsemi.py:6-17), determinism here comes free from JAX
PRNG keys.
"""

from mrgan_tpu.cli.wgan_grid import main, run_fold  # noqa: F401

if __name__ == "__main__":
    main()
