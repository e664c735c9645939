#!/usr/bin/env python3
"""Compare regenerated table artifacts against the published curves.

Prints, per table/modality curve: regenerated accuracy at each grid point
next to the published value (reference paperplotly.py:16-23,49-54), the mean
absolute delta, and two shape diagnostics the synthetic-data calibration is
judged on (VERDICT round 1, missing #1):

- span: max-min of the curve (a saturated generator compresses this to ~0);
- rho:  Spearman rank correlation between the regenerated and published
        curves (does the curve RISE where the published one rises?).

Usage: python tools/compare_published.py [--artifacts artifacts]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mrgan_tpu.reports import plots  # noqa: E402


def _spearman(a, b):
    ra, rb = (np.argsort(np.argsort(v)) for v in (np.asarray(a),
                                                  np.asarray(b)))
    if len(ra) < 2:
        return float("nan")
    ca, cb = ra - ra.mean(), rb - rb.mean()
    d = np.sqrt((ca ** 2).sum() * (cb ** 2).sum())
    return float((ca * cb).sum() / d) if d else float("nan")


def _report(curves, published, pub_x, label):
    print(f"\n== {label} ==")
    any_missing = False
    for name, pub in published.items():
        got = curves.get(name)
        if not got:
            print(f"  {name:35s} MISSING")
            any_missing = True
            continue
        x, acc = got
        pub_map = dict(zip(pub_x(name), pub))
        pairs = [(xx, aa, pub_map[xx]) for xx, aa in zip(x, acc)
                 if xx in pub_map]
        if not pairs:
            print(f"  {name:35s} no overlapping grid points")
            any_missing = True
            continue
        _, accs, pubs = zip(*pairs)
        dd = np.abs(np.asarray(accs) - np.asarray(pubs))
        print(f"  {name:35s} |d|={dd.mean():5.1f}  "
              f"span={max(accs) - min(accs):5.1f} (pub {max(pubs) - min(pubs):5.1f})  "
              f"rho={_spearman(accs, pubs):+.2f}")
        for xx, aa, pp in pairs:
            print(f"      x={xx:<6g} got={aa:5.1f}  pub={pp:5.1f}  "
                  f"d={aa - pp:+5.1f}")
    return not any_missing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    args = ap.parse_args()

    t1 = os.path.join(args.artifacts, "t1_sweep.jsonl")
    if os.path.exists(t1):
        _report(plots.curves_from_checkpoint(t1, table=1), plots.TABLE1,
                lambda name: plots.TABLE1_X, "Table 1 (GAN, % labeled)")

    t5 = os.path.join(args.artifacts, "t5_sweep.jsonl")
    if os.path.exists(t5):
        _report(
            plots.curves_from_checkpoint(t5, table=5), plots.TABLE5,
            lambda name: (plots.TABLE5_X_CONTACT if name == "Contact mic"
                          else plots.TABLE5_X),
            "Table 5 (GAN, window duration)")

    t24 = os.path.join(args.artifacts, "t24_nn.jsonl")
    if os.path.exists(t24) and os.path.exists(t1):
        # published table 2 (MLP baseline) exists only for the force+temp
        # and F+T+mic rows quoted in BASELINE.md; compare the headline
        # GAN-vs-MLP gap instead: GAN@1% minus MLP@1% per modality
        gan = plots.curves_from_checkpoint(t1, table=1)
        mlp = plots.curves_from_checkpoint(t24, table=2)
        print("\n== GAN-vs-MLP @1% labels (semi-supervised effect) ==")
        for name, (x, acc) in sorted(mlp.items()):
            if name not in gan:
                continue
            g = dict(zip(*gan[name])).get(1)
            m = dict(zip(x, acc)).get(1)
            if g is None or m is None:
                continue
            flag = "OK " if g > m else "INV"
            print(f"  {flag} {name:35s} gan={g:5.1f}  mlp={m:5.1f}  "
                  f"gap={g - m:+5.1f}")


if __name__ == "__main__":
    main()
