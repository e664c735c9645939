#!/usr/bin/env python3
"""Calibrate the synthetic MREO generator's hardness against the published
accuracy bands (BASELINE.md).

Runs fast proxy classifiers (RBF SVM, the production protocol's scaling and
labeled-subset selection) on full-scale synthetic data per modality at 100%
and 1% labels, one stratified fold, and prints the measured accuracies next
to the published GAN accuracies. The SVM is a proxy: the paper's SVM trails
its GAN by a few points at 100% labels and by more at 1%, so the target is
"lands in the band / ordering preserved / no saturation", not equality.

Usage: python tools/calibrate_synthetic.py [--modalities 0 1 2 3 5]
       [--contactmic-time 0.2] [--pokes 100] [--seed 0]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# published GAN accuracies @ {1,100}% labels (paperplotly.py:17-23)
PUBLISHED = {
    0: (62.1, 87.9), 1: (53.8, 82.1), 2: (74.3, 95.3), 3: (42.9, 83.1),
    4: (52.4, 92.2), 5: (62.8, 96.2), 6: (58.2, 91.8),
}


def svm_acc(x_tr, y_tr, x_te, y_te):
    from sklearn.svm import SVC

    clf = SVC(kernel="rbf", C=1.0, gamma="scale")
    clf.fit(x_tr, y_tr)
    return clf.score(x_te, y_te)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modalities", type=int, nargs="+",
                    default=[0, 1, 2, 3, 5])
    ap.add_argument("--contactmic-time", type=float, default=0.2)
    ap.add_argument("--forcetemp-time", type=float, default=4.0)
    ap.add_argument("--pokes", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--percents", type=float, nargs="+", default=[1, 100])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from mrgan_tpu.data import mreo
    from mrgan_tpu.train import protocol

    for m in args.modalities:
        t0 = time.time()
        x, y = mreo.load_features(
            modalities=m, forcetemp_time=args.forcetemp_time,
            contactmic_time=args.contactmic_time, synthetic_seed=args.seed,
            synthetic_kwargs={"pokes_per_object": args.pokes})
        (tr, te), *_ = protocol.stratified_splits(y, n_splits=6,
                                                  seed=args.seed)
        rng = np.random.RandomState(args.seed)
        accs = {}
        for pct in args.percents:
            x_tr, x_te = protocol.scale_fold(
                np.asarray(x[tr], np.float32), np.asarray(x[te], np.float32))
            xl, yl, _, _ = protocol.select_labeled(
                x_tr, y[tr], int(10 * pct), 6, rng)
            accs[pct] = svm_acc(xl, yl, x_te, y[te])
        pub = PUBLISHED[m]
        print(f"mod {m}: d={x.shape[1]:6d} "
              + " ".join(f"svm@{int(p)}%={100*a:5.1f}" for p, a in accs.items())
              + f"   published GAN @1/100%: {pub[0]}/{pub[1]}"
              + f"   ({time.time()-t0:.0f}s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
