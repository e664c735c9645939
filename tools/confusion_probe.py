#!/usr/bin/env python3
"""Per-class confusion probe for the F+T fusion-gain residual (round-5 lead).

The round-5 gate's one substantive residual is the Force+Temperature curve's
cold low-label end (67.1 % @1 % vs published 74.3): the published fusion
gains ~12 points over the best single modality at 1 % labels, ours ~6.
Level-style nuisance knobs were probed and reverted with paired evidence
(see data/synthetic.py); the remaining hypothesis is STRUCTURAL — fusion
pays when the two channels confuse DIFFERENT class pairs, so the question
is which pairs each channel confuses and how much those confusions overlap.

This tool trains one stratified fold per (modality, percent) with
train_folds(with_params=True), runs the trained discriminator on the test
split, and prints the 6x6 confusion matrix plus, per modality pair, the
overlap of their confused class pairs (cosine similarity of off-diagonal
confusion masses). High overlap at 1 % labels = the structural explanation;
the fix then lives in _MATERIAL_PHYSICS's cluster layout, not in nuisance
amplitudes.

Usage: python tools/confusion_probe.py [--modalities 0 1 2]
           [--percents 1 100] [--pokes 100] [--epochs 100] [--seed 0]
(small --pokes runs on CPU for a quick structural read; full scale on the
chip for gate-grade numbers)
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def confusion(modality, percent, pokes, epochs, seed):
    import jax

    from mrgan_tpu import MATERIALS
    from mrgan_tpu.data import mreo
    from mrgan_tpu.models import nets
    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import rng as rng_util

    x, y = mreo.load_features(
        modalities=modality, synthetic_seed=seed,
        synthetic_kwargs={"pokes_per_object": pokes})
    tr, te = protocol.stratified_splits(np.asarray(y), 6, seed=seed)[0]
    rng = np.random.RandomState(seed)
    fold = protocol.prepare_fold(x[tr], y[tr], x[te], y[te], percent, rng=rng)
    cfg = gan.GanConfig(epochs=epochs)
    stacked = protocol.stack_folds([fold])
    valid_dim = stacked["x_labeled"].shape[-1]
    for k in ("x_labeled", "pool", "x_test"):
        stacked[k], _ = gan.pad_features(stacked[k], cfg.pad_multiple)
    keys = rng_util.make_keys(rng.randint(2**31 - 1), 1)
    errs, aux = gan.train_folds(
        keys, stacked["x_labeled"], stacked["y_labeled"], stacked["pool"],
        stacked["x_test"], stacked["y_test"], fold["n_train"],
        valid_dim=valid_dim, cfg=cfg, with_params=True)
    disc = jax.tree_util.tree_map(lambda a: a[0], aux["params"]["disc"])
    logits, _ = nets.discriminator_apply(disc, stacked["x_test"][0],
                                         train=False)
    pred = np.asarray(jax.numpy.argmax(logits, -1))
    yt = np.asarray(stacked["y_test"][0])
    cm = np.zeros((6, 6), int)
    for t, p in zip(yt, pred):
        cm[t, p] += 1
    acc = 100.0 * float(np.mean(pred == yt))
    return cm, acc, list(MATERIALS)


def off_diag_vec(cm):
    """Symmetrized off-diagonal confusion masses as a 15-vector."""
    c = cm.astype(float)
    c = c / np.maximum(c.sum(1, keepdims=True), 1)
    v = []
    for i in range(6):
        for j in range(i + 1, 6):
            v.append(c[i, j] + c[j, i])
    return np.asarray(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modalities", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--percents", type=float, nargs="+", default=[1, 100])
    ap.add_argument("--pokes", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    mats = None
    vecs = {}
    for pct in args.percents:
        for m in args.modalities:
            cm, acc, mats = confusion(m, pct, args.pokes, args.epochs,
                                      args.seed)
            vecs[(m, pct)] = off_diag_vec(cm)
            print(f"\n== modality {m} @ {pct:g}% labels: acc {acc:.1f}% ==")
            short = [s[:4] for s in mats]
            print("      " + " ".join(f"{s:>5}" for s in short))
            for i, row in enumerate(cm):
                print(f"{short[i]:>5} " + " ".join(f"{v:5d}" for v in row))
        print(f"\n-- confusion-overlap (cosine of off-diagonal masses) "
              f"@ {pct:g}% --")
        ms = [m for m in args.modalities if (m, pct) in vecs]
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                va, vb = vecs[(a, pct)], vecs[(b, pct)]
                d = np.linalg.norm(va) * np.linalg.norm(vb)
                cos = float(va @ vb / d) if d else float("nan")
                print(f"  m{a} vs m{b}: {cos:+.2f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
