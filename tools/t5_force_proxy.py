#!/usr/bin/env python3
"""Fast CPU proxy for the Table-5 Force duration-curve shape.

RBF-SVM accuracy at 100 % labels, one stratified fold, modality 0 (force)
across the Table-5 forcetemp durations. Used to calibrate the synthetic
force channel's duration profile against the published curve
(reference paperplotly.py:51, TABLE5 Force: 70.9 -> 87.9 over 0.1 -> 4 s)
without spending TPU time per iteration: the proxy tracks the GAN's
SHAPE (what information exists at each duration), not its level.

Usage: python tools/t5_force_proxy.py [--durations 0.1 0.2 1 4] [--pokes 60]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--durations", type=float, nargs="+",
                    default=[0.1, 0.2, 0.5, 1, 4])
    ap.add_argument("--pokes", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modality", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sklearn.svm import SVC

    from mrgan_tpu.data import mreo
    from mrgan_tpu.train import protocol

    for dur in args.durations:
        t0 = time.time()
        x, y = mreo.load_features(
            modalities=args.modality, forcetemp_time=dur,
            contactmic_time=0.2, synthetic_seed=args.seed,
            synthetic_kwargs={"pokes_per_object": args.pokes})
        (tr, te), *_ = protocol.stratified_splits(y, n_splits=6,
                                                  seed=args.seed)
        x_tr, x_te = protocol.scale_fold(
            np.asarray(x[tr], np.float32), np.asarray(x[te], np.float32))
        clf = SVC(kernel="rbf", C=1.0, gamma="scale")
        clf.fit(x_tr, y[tr])
        acc = clf.score(x_te, y[te])
        print(f"dur {dur:4g}s d={x.shape[1]:5d} svm@100%={100*acc:5.1f}"
              f"  ({time.time()-t0:.0f}s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
