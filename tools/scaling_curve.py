#!/usr/bin/env python3
"""Measure sweep-axis scaling ON ONE CHIP by stacking same-shape cells.

The multi-chip projection (BASELINE.md's >20x target) rests on the sweep
axis scaling linearly across devices: each chip trains independent cells
with zero inter-chip communication. This tool replaces that assertion with
a measurement: it stacks W fused fold-trainings per launch (vmap width W)
at the flagship Table-1 shapes and reports aggregate updates/s vs W. If
updates/s grows with W (the per-step program is HBM-latency/overhead-bound,
not saturating the chip at W=6), then N chips running W=6 each trivially
exceed N x (W=6 throughput) — there is no shared resource between cells
but the host, and per-cell host work is index prep only (KB-scale).

Each width runs in its own subprocess: wide 100-epoch launches are a known
TPU-worker crash shape on this stack (STATUS.md), so a crash must only
lose that probe.

Usage: python tools/scaling_curve.py [--widths 1 2 4 6 8 12]
       [--epochs 20] [--feat-dim 3632] [--out /tmp/scaling.jsonl]
"""

import argparse
import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
import numpy as np

width, epochs, feat_dim = (int(sys.argv[1]), int(sys.argv[2]),
                           int(sys.argv[3]))
from mrgan_tpu.train import gan, protocol
from mrgan_tpu.utils import compile_cache, rng as rng_util
import jax

compile_cache.enable()
cfg = gan.GanConfig(epochs=epochs)
n = 7200
rng = np.random.RandomState(0)
x = rng.randn(n, feat_dim).astype(np.float32)
y = np.tile(np.arange(6, dtype=np.int32), n // 6)
ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
jax.block_until_ready(ds.X)
splits = protocol.stratified_splits(y, n_splits=6, seed=1)
prot_rng = np.random.RandomState(1)
idx = [protocol.fold_indices(ds.y_host, tr, te, 100, None, 6, prot_rng)
       for tr, te in splits]
# stack W cells by tiling the 6 folds cyclically
lab, pool, train, test = (
    np.stack([idx[w % 6][i] for w in range(width)]) for i in range(4))
keys = rng_util.make_keys(0, width)

def run():
    errs = gan.train_folds_indexed(keys, ds.X, ds.y, lab, pool, train, test,
                                   valid_dim=ds.valid_dim, cfg=cfg)
    return np.asarray(errs)

run()  # compile + warmup
t0 = time.perf_counter()
errs = run()
dt = time.perf_counter() - t0
steps = width * epochs * (train.shape[-1] // cfg.batch_size)
print("CHILD_RESULT " + json.dumps({
    "width": width, "epochs": epochs, "feat_dim": feat_dim,
    "wall_s": round(dt, 2), "updates_per_s": round(steps / dt, 1),
    "updates_per_s_per_cell": round(steps / dt / width, 1),
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[1, 2, 4, 6, 8, 12])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--feat-dim", type=int, default=3632)
    ap.add_argument("--out", default="/tmp/scaling.jsonl")
    args = ap.parse_args()

    # fresh file per run: the queue relaunches this tool after outages, and
    # summarize_regen renders every record — stale/duplicate rows would be
    # reported as current
    open(args.out, "w").close()
    results = []
    for w in args.widths:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, str(w), str(args.epochs),
                 str(args.feat_dim)],
                capture_output=True, text=True, timeout=1800)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("CHILD_RESULT ")), None)
        except subprocess.TimeoutExpired:
            # a hung probe (e.g. backend unreachable) must also only lose
            # that width, same as a crash
            proc, line = None, None
        if line is None:
            tail = (proc.stderr or proc.stdout)[-400:] if proc else "timeout"
            rec = {"width": w, "crashed": True, "tail": tail}
        else:
            rec = json.loads(line[len("CHILD_RESULT "):])
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print("SCALING_DONE")


if __name__ == "__main__":
    main()
