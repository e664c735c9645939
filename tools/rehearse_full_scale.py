#!/usr/bin/env python3
"""Full-size real-dataset rehearsal (VERDICT r3 next #7).

De-risks the day the actual MREO distribution arrives by driving the ENTIRE
offline path at the real dataset's scale — fabricated python-2 raw pickles
(the 10 GB raw set's layout: data_raw/newdata_<material>_<object>.pkl, one
file per object, 100 pokes of ragged 48 kHz/1 kHz/100 Hz streams) through
processdata.py (all 14 window configs -> the ~20 GB full processed set) into
``mr_gan.py --tables 5`` on hardware with the HBM-resident streaming path:

  --fabricate   write the raw set (py2-written streams via data/py2pickle.py
                so the bytes exercise the latin1 loaders)
  --process     processdata over all 14 configs (prefix '' -> loader names)
  --tables5     the full 28-cell Table-5 sweep from those processed pickles
  --report      print the stage metrics JSON collected so far

Scale calibration (VERDICT r4 weak #7 — round 4's 26 GB raw / 12 GB
processed inverted the documented 10 GB raw / 20 GB processed ratio):
- raw streams are now float64 by default (the real stack moves every sample
  through ROS Float64MultiArray, collectdataPoke.py:97-100, so real raw
  pickles hold float64), record window 5.0 s (the minimum covering the 4 s
  processdata configs from a ~0.8 s impact) -> ~33 GB on disk;
- processed output mirrors interp1d's float64 (the reference never casts,
  processdata.py:58-83) -> ~25 GB on disk, matching the documented 20 GB
  full set to within dtype/duration slack;
- the documented 10 GB *raw* is the DOWNLOAD size of an archive of smooth,
  highly-compressible sensor streams — the fabricate stage measures a gzip
  ratio on sample files and logs the implied archive size next to the
  on-disk bytes, so REAL_DATA.md can reconcile both numbers.

Each stage appends a JSON line to artifacts/rehearsal.jsonl with wall clock
and peak host RSS (ru_maxrss of this process + the sweep subprocess), so
REAL_DATA.md can quote measured numbers instead of estimates.

Accuracy on the fabricated set is NOT meaningful (generate_raw_file is the
simple schema-fidelity physics, not the calibrated generate_processed) —
this rehearsal proves memory, wall clock, and fault-free plumbing at scale.
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
ART = os.path.join(REPO, "artifacts", "rehearsal.jsonl")


def _peak_rss_gb():
    # linux ru_maxrss is KB
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _log(rec):
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    sys.stdout.flush()


def _tree_gb(path):
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total / 1e9


def _gzip_ratio(path):
    """Compression ratio (gz/raw) of one file, streaming, no temp file."""
    import gzip
    import io

    raw_bytes = os.path.getsize(path)
    counter = io.BytesIO()
    with open(path, "rb") as src, \
            gzip.GzipFile(fileobj=counter, mode="wb", compresslevel=6) as gz:
        while True:
            chunk = src.read(1 << 22)
            if not chunk:
                break
            gz.write(chunk)
    return counter.tell() / raw_bytes


def fabricate(raw_dir, pokes, objects, py2, record_s):
    from mrgan_tpu import MATERIALS
    from mrgan_tpu.data import py2pickle, synthetic

    os.makedirs(raw_dir, exist_ok=True)
    t0 = time.time()
    n_files = 0
    sample = None
    for mi, material in enumerate(MATERIALS):
        for k in range(objects):
            path = os.path.join(raw_dir,
                                f"newdata_{material}_obj{k:02d}.pkl")
            sample = sample or path
            if os.path.exists(path):
                continue  # resumable
            raw = synthetic.generate_raw_file(
                seed=1000 * mi + k, material=material, pokes=pokes,
                record_s=record_s)
            if py2:
                blob = py2pickle.dumps_py2(raw)
                with open(path, "wb") as f:
                    f.write(blob)
            else:
                import pickle
                with open(path, "wb") as f:
                    pickle.dump(raw, f, 2)
            n_files += 1
            if n_files % 6 == 0:
                print(f"  fabricated {n_files} files, "
                      f"{_tree_gb(raw_dir):.1f} GB, "
                      f"{time.time() - t0:.0f}s", flush=True)
    raw_gb = _tree_gb(raw_dir)
    # documented raw size (reference README.md:9, 10 GB) is a download of
    # smooth float64 streams — measure how an archive of this set compares
    gz = _gzip_ratio(sample) if sample else float("nan")
    _log({"stage": "fabricate", "files": 6 * objects, "pokes": pokes,
          "py2": py2, "record_s": record_s, "raw_gb": round(raw_gb, 2),
          "gzip_ratio_sample": round(gz, 3),
          "implied_archive_gb": round(raw_gb * gz, 2),
          "wall_s": round(time.time() - t0, 1),
          "peak_host_rss_gb": round(_peak_rss_gb(), 2)})


def process(raw_dir, out_dir):
    from mrgan_tpu.data import preprocess

    t0 = time.time()
    preprocess.run(raw_dir=raw_dir, out_dir=out_dir, prefix="")
    _log({"stage": "process", "configs": len(preprocess.CONFIGS),
          "processed_gb": round(_tree_gb(out_dir), 2),
          "wall_s": round(time.time() - t0, 1),
          "peak_host_rss_gb": round(_peak_rss_gb(), 2)})


def tables5(out_dir, epochs):
    t0 = time.time()
    ckpt = os.path.join(REPO, "artifacts", "rehearsal_t5.jsonl")
    met = os.path.join(REPO, "artifacts", "rehearsal_t5_metrics.jsonl")
    cmd = [sys.executable, os.path.join(REPO, "mr_gan.py"), "--tables", "5",
           "--data-dir", out_dir, "--epochs", str(epochs), "--seed", "0",
           "--no-mesh", "--checkpoint", ckpt, "--metrics", met]
    # forbid the silent synthetic fallback for absent configs — a cell in
    # this sweep must mean "trained from the fabricated real-format files"
    env = dict(os.environ, MRGAN_REQUIRE_PROCESSED="1")
    res = subprocess.run(cmd, cwd=REPO, env=env)
    kid = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    n_cells = 0
    if os.path.exists(ckpt):
        with open(ckpt) as f:
            n_cells = sum(1 for line in f if line.strip())
    _log({"stage": "tables5", "returncode": res.returncode,
          "cells": n_cells, "epochs": epochs,
          "wall_s": round(time.time() - t0, 1),
          "peak_sweep_rss_gb": round(kid, 2)})
    return res.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fabricate", action="store_true")
    ap.add_argument("--process", action="store_true")
    ap.add_argument("--tables5", action="store_true")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--raw-dir", default=os.path.join(REPO, "data_raw_rehearsal"))
    ap.add_argument("--out-dir",
                    default=os.path.join(REPO, "data_processed_rehearsal"))
    ap.add_argument("--pokes", type=int, default=100)
    ap.add_argument("--objects", type=int, default=12, help="per material")
    ap.add_argument("--record-s", type=float, default=5.0,
                    help="raw record window; 5.0 s is the minimum covering "
                         "the 4 s processdata configs from a ~0.8 s impact")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--no-py2", action="store_true",
                    help="plain py3 pickles (faster; skips the latin1 path)")
    args = ap.parse_args()

    rc = 0
    if args.fabricate:
        fabricate(args.raw_dir, args.pokes, args.objects, not args.no_py2,
                  args.record_s)
    if args.process:
        process(args.raw_dir, args.out_dir)
    if args.tables5:
        rc = tables5(args.out_dir, args.epochs)
    if args.report and os.path.exists(ART):
        with open(ART) as f:
            for line in f:
                print(line, end="")
    sys.exit(rc)


if __name__ == "__main__":
    main()
