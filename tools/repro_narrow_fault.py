#!/usr/bin/env python3
"""Minimal deterministic repro for the narrow-width TPU codegen fault that
the production sweeps work around with ``--pad-min 1280`` (train/gan.py
pad_features docstring; VERDICT r3 next #6).

Observed since round 1: the fused disc+gen trainer crashes the TPU worker
at certain narrow feature widths (640 is the canonical one) while the
proven Table-1/3/6 widths (1280+) run thousands of trainings clean. This
tool pins the repro so (a) the bucket can be retired the day the toolchain
stops faulting, and (b) the fault can be reported upstream with a
one-command reproducer.

Each trial runs in a SUBPROCESS (the fault kills the worker process, not
just the computation) training one tiny GAN fold at the requested feature
width with bucketing disabled (pad_min=0). The parent reports pass/crash
per width and writes the crashing child's tail + the XLA dump (when
--dump-hlo is given) under --out.

Usage:
  python tools/repro_narrow_fault.py                 # 640 vs 1280 control
  python tools/repro_narrow_fault.py --widths 512 640 768 896 1024 1280
  python tools/repro_narrow_fault.py --dump-hlo --out /tmp/narrow_fault
"""

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import sys
import numpy as np

width = int(sys.argv[1])
epochs = int(sys.argv[2])

from mrgan_tpu.train import gan, protocol

x = np.random.RandomState(0).randn(1200, width).astype(np.float32)
y = np.tile(np.arange(6, dtype=np.int32), 200)
cfg = gan.GanConfig(epochs=epochs, pad_min=0)  # bucketing disabled
errors = protocol.run_gan_cell(x, y, 100, cfg=cfg, seed=0, n_splits=2)
print("CHILD_OK", [round(float(e), 4) for e in errors])
"""


def run_trial(width, epochs, dump_dir=None, timeout=900):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the fault is TPU-backend-specific
    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_dump_to={dump_dir}").strip()
    try:
        res = subprocess.run(
            [sys.executable, "-c", CHILD, str(width), str(epochs)],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    except subprocess.TimeoutExpired as e:
        return {"width": width, "status": "timeout",
                "tail": (e.stdout or "")[-2000:] if e.stdout else ""}
    ok = res.returncode == 0 and "CHILD_OK" in res.stdout
    tail = (res.stdout + res.stderr)[-4000:]
    return {"width": width,
            "status": "ok" if ok else "crash",
            "returncode": res.returncode,
            "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+", default=[640, 1280],
                    help="feature widths to trial (640 = canonical fault, "
                         "1280 = proven-safe control)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--dump-hlo", action="store_true",
                    help="XLA-dump the crashing widths' HLO under --out")
    ap.add_argument("--out", default="/tmp/narrow_fault")
    args = ap.parse_args()

    results = []
    for w in args.widths:
        dump = os.path.join(args.out, f"hlo_w{w}") if args.dump_hlo else None
        r = run_trial(w, args.epochs, dump_dir=dump)
        results.append(r)
        print(json.dumps({k: v for k, v in r.items() if k != "tail"}))
        sys.stdout.flush()
        if r["status"] != "ok":
            os.makedirs(args.out, exist_ok=True)
            tail_path = os.path.join(args.out, f"crash_w{w}.log")
            with open(tail_path, "w") as f:
                f.write(r["tail"])
            print(f"  (crash tail -> {tail_path}"
                  + (f", HLO dump -> {dump}" if dump else "") + ")")

    crashed = [r["width"] for r in results if r["status"] != "ok"]
    passed = [r["width"] for r in results if r["status"] == "ok"]
    print(f"\ncrashed: {crashed}  passed: {passed}")
    if 640 in passed:
        print("width 640 now PASSES — the toolchain fault appears fixed; "
              "consider retiring the --pad-min 1280 bucket "
              "(train/gan.py pad_features, cli/tables.py --pad-min).")
    return 1 if crashed else 0


if __name__ == "__main__":
    sys.exit(main())
