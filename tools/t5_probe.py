#!/usr/bin/env python3
"""Single-cell Table-5 GAN probe on hardware.

Runs exactly the gan_table5 cell (cli/tables.py:244-273: synthetic dataset,
6-fold protocol, 100 labels/class, epochs 100, pad_min 1280) for one
modality at the given forcetemp durations, printing the fold errors and
cell accuracy. Used to validate generator recalibrations against specific
published Table-5 points without a full 28-cell regen.

Usage: python tools/t5_probe.py --durations 0.1 4.0 [--modality 0]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--durations", type=float, nargs="+", required=True)
    ap.add_argument("--modality", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mrgan_tpu.data import mreo
    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = gan.GanConfig(epochs=args.epochs, pad_min=1280)
    for dur in args.durations:
        t0 = time.time()
        x, y = mreo.load_features(
            modalities=args.modality, forcetemp_time=dur,
            contactmic_time=0.2, synthetic_seed=args.seed)
        errors = protocol.run_gan_cell(x, y, 100, cfg=cfg, seed=args.seed)
        acc = 100.0 * (1.0 - float(np.mean(errors)))
        print(f"dur {dur:4g}s d={x.shape[1]:5d} gan_acc={acc:5.1f} "
              f"folds={[round(100*(1-e), 1) for e in errors]} "
              f"({time.time()-t0:.0f}s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
