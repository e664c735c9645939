#!/usr/bin/env python3
"""Reduced-fidelity FULL-GRID calibration proxy for the synthetic generator.

VERDICT r4 weak #1 / next #1 — the method fix: single-cell probes provably
do not predict 6-fold sweep means (round-4 iteration 3 "passed" its probes,
then the full regen failed 4 gate checks), and a full-fidelity regen costs
~1.5 h of chip per iteration. This tool runs EVERY Table-1 and Table-5 cell
at reduced fidelity — the first ``--folds`` of the SAME seed-0 stratified
6-fold splits, ``--epochs`` epochs — so one calibration iteration costs
minutes, with a measured proxy->full offset map making the prediction
quantitative:

  run      train the reduced grid, write a proxy sweep JSONL
           (artifacts/proxy/proxy_<generator>.jsonl)
  offsets  offsets.json = full-fidelity minus proxy accuracy per cell,
           measured ONCE on artifacts produced under the SAME generator
           version, plus each cell's 6-fold noise (std of fold errors)
  gate     evaluate tools/parity_thresholds.json on PREDICTED full-fidelity
           curves (proxy + offset), with per-check margins, so an iteration
           is judged on the whole grid before committing chip-hours

Protocol semantics match cli/tables.py exactly (datasets via
mreo.load_features at seed 0, GanConfig pad_min=1280 for Table 5,
run_gan_cell per-cell RNG) — only the fold subset and epoch count differ,
which is exactly what the offset map measures.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T1_PERCENTS = [1, 2, 4, 8, 16, 50, 100]
FT_TIMES = [4, 3, 2, 1, 0.5, 0.2, 0.1]
C_TIMES = [1, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05]


def grid_cells(grids):
    """(table, modality, key-dict, dataset-kwargs) for every sweep cell."""
    cells = []
    if "t1" in grids:
        for m in range(7):
            for p in T1_PERCENTS:
                cells.append((1, m, {"percent": p}, {"modalities": m}))
    if "t5" in grids:
        for m in (0, 1, 2):
            for ft in FT_TIMES:
                cells.append((5, m, {"ft_time": ft},
                              {"modalities": m, "forcetemp_time": ft}))
        for ct in C_TIMES:
            cells.append((5, 3, {"c_time": ct},
                          {"modalities": 3, "contactmic_time": ct}))
    return cells


def cell_key(table, modality, key):
    d = {"model": "gan", "table": table, "modality": modality, **key}
    return json.dumps(d, sort_keys=True)


def run(args):
    from mrgan_tpu.data import mreo, synthetic
    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import checkpoint as ckpt_lib
    from mrgan_tpu.utils import compile_cache, stamp as stamp_lib

    compile_cache.enable()
    out = args.out or os.path.join(
        "artifacts", "proxy", f"proxy_{synthetic.GENERATOR_VERSION}.jsonl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    ckpt = ckpt_lib.SweepCheckpoint(out)
    stamp = stamp_lib.current(synthetic=True)
    stamp["proxy"] = {"folds": args.folds, "epochs": args.epochs}

    # group cells by dataset so each dataset is generated once
    by_ds = {}
    for table, m, key, dkw in grid_cells(args.grids):
        by_ds.setdefault(json.dumps(dkw, sort_keys=True), []).append(
            (table, m, key, dkw))

    t_start = time.time()
    for _, cells in sorted(by_ds.items()):
        todo = [c for c in cells
                if ckpt.get(model="gan", table=c[0], modality=c[1],
                            **c[2]) is None]
        if not todo:
            continue
        dkw = todo[0][3]
        t0 = time.time()
        x, y = mreo.load_features(synthetic_seed=args.seed, **dkw)
        gen_s = time.time() - t0
        cfg = gan.GanConfig(
            epochs=args.epochs,
            pad_min=1280 if todo[0][0] == 5 else 0)
        ds = protocol.DeviceDataset(x, y, cfg.pad_multiple,
                                    pad_min=cfg.pad_min)
        splits6 = protocol.stratified_splits(ds.y_host, n_splits=6,
                                             seed=args.seed)
        for table, m, key, _ in todo:
            pct = key.get("percent", 100)
            t1 = time.time()
            errors = protocol.run_gan_cell(
                ds, percentlabeled=pct, cfg=cfg, seed=args.seed,
                splits=splits6[: args.folds])
            errors = [float(e) for e in errors]
            ckpt.record(errors, stamp=stamp, model="gan", table=table,
                        modality=m, **key)
            acc = 100.0 * (1.0 - float(np.mean(errors)))
            print(f"proxy t{table} m{m} {key} acc={acc:5.1f} "
                  f"({time.time() - t1:.0f}s train, {gen_s:.0f}s gen)")
            sys.stdout.flush()
            gen_s = 0.0
        del ds, x, y
    print(f"proxy grid done in {(time.time() - t_start) / 60:.1f} min -> "
          f"{out}")


def _accs_from_jsonl(path):
    """{cell-key: (mean acc %, fold std of accs)} from a sweep JSONL,
    plus the set of generator stamps seen."""
    accs, gens = {}, set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            c = rec["cell"]
            errs = np.asarray(rec["result"], float)
            k = cell_key(c["table"], c["modality"],
                         {k: v for k, v in c.items()
                          if k in ("percent", "ft_time", "c_time")})
            accs[k] = (100.0 * (1.0 - float(errs.mean())),
                       100.0 * float(errs.std(ddof=1)) if len(errs) > 1
                       else 0.0)
            gens.add((rec.get("stamp") or {}).get("generator", "unstamped"))
    return accs, gens


def offsets(args):
    """offsets.json: per-cell full-fidelity minus proxy accuracy (and the
    full run's fold noise). Refuses mismatched generator stamps."""
    proxy, pgens = _accs_from_jsonl(args.proxy)
    full, fgens = {}, set()
    for name in ("t1_sweep.jsonl", "t5_sweep.jsonl"):
        p = os.path.join(args.artifacts, name)
        if os.path.exists(p):
            a, g = _accs_from_jsonl(p)
            full.update(a)
            fgens |= g
    if len(pgens | fgens) > 1 and not args.allow_mixed:
        sys.exit(f"REFUSED: proxy stamped {sorted(pgens)} but full "
                 f"artifacts stamped {sorted(fgens)} — offsets must be "
                 "measured under ONE generator version "
                 "(--allow-mixed to override)")
    out = {}
    for k, (pa, _) in proxy.items():
        if k in full:
            fa, fstd = full[k]
            out[k] = {"offset": round(fa - pa, 3),
                      "full_fold_std": round(fstd, 3)}
    off = np.array([v["offset"] for v in out.values()])
    with open(args.out, "w") as f:
        json.dump({"generator": sorted(pgens | fgens),
                   "proxy_file": args.proxy, "n": len(out),
                   "mean_offset": round(float(off.mean()), 3),
                   "std_offset": round(float(off.std()), 3),
                   "cells": out}, f, indent=1)
    print(f"{len(out)} offsets -> {args.out}; mean {off.mean():+.2f} "
          f"std {off.std():.2f} min {off.min():+.2f} max {off.max():+.2f}")


def gate(args):
    """Predicted-gate evaluation: proxy accs + offsets -> predicted full
    curves -> the committed thresholds, with margins."""
    from mrgan_tpu.reports import plots
    from tools import compare_published as cp

    proxy, pgens = _accs_from_jsonl(args.proxy)
    with open(args.offsets) as f:
        offmap = json.load(f)["cells"]
    missing = [k for k in proxy if k not in offmap]
    if missing:
        print(f"[{len(missing)} proxy cells have no measured offset; "
              "using the grid mean]")
    moff = np.mean([v["offset"] for v in offmap.values()]) if offmap else 0.0

    # predicted curves keyed like plots.curves_from_checkpoint
    by_curve = {1: {}, 5: {}}
    for k, (pa, _) in proxy.items():
        c = json.loads(k)
        name = plots.MODALITY_CURVES[c["modality"]]
        x = c.get("percent", c.get("ft_time", c.get("c_time")))
        pred = pa + offmap.get(k, {"offset": moff})["offset"]
        by_curve[c["table"]].setdefault(name, []).append((x, pred))
    curves = {t: {n: tuple(zip(*sorted(pts))) for n, pts in d.items()}
              for t, d in by_curve.items()}

    records = []
    if curves[1]:
        records += cp.collect(curves[1], plots.TABLE1,
                              lambda n: plots.TABLE1_X, "table1")
    if curves[5]:
        records += cp.collect(
            curves[5], plots.TABLE5,
            lambda n: (plots.TABLE5_X_CONTACT if n == "Contact mic"
                       else plots.TABLE5_X), "table5")
    for rec in records:
        if not rec.get("missing"):
            cp.report([rec], f"{rec['family']}/{rec['name']} (PREDICTED)")
    with open(args.thresholds) as f:
        thresholds = json.load(f)
    violations = cp.evaluate_gate(
        [r for r in records if not r.get("missing")], thresholds)
    print(f"\n== PREDICTED gate (proxy {sorted(pgens)}, offsets "
          f"{args.offsets}) ==")
    for v in violations:
        print(f"  FAIL {v}")
    if not violations:
        print("  PASS (predicted)")
    sys.exit(1 if violations else 0)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="train the reduced full grid")
    r.add_argument("--folds", type=int, default=2)
    r.add_argument("--epochs", type=int, default=40)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--grids", nargs="+", default=["t1", "t5"])
    r.add_argument("--out", default=None)
    r.set_defaults(fn=run)

    o = sub.add_parser("offsets", help="measure proxy->full offsets")
    o.add_argument("--proxy", required=True)
    o.add_argument("--artifacts", default="artifacts")
    o.add_argument("--out", default="artifacts/proxy/offsets.json")
    o.add_argument("--allow-mixed", action="store_true")
    o.set_defaults(fn=offsets)

    g = sub.add_parser("gate", help="evaluate the predicted gate")
    g.add_argument("--proxy", required=True)
    g.add_argument("--offsets", default="artifacts/proxy/offsets.json")
    g.add_argument("--thresholds",
                   default=os.path.join(os.path.dirname(__file__),
                                        "parity_thresholds.json"))
    g.set_defaults(fn=gate)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
