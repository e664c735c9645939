#!/usr/bin/env python3
"""MEASURED roofline for the fused disc+gen GAN update (VERDICT r3 next #4).

tools/roofline.py models bytes/update by hand (204 MB) and concludes the
step runs at ~76 % of HBM bandwidth; the remaining ~24 % was unexplained.
This tool replaces the model with data from the actual compiled program:

1. AOT-compiles the PRODUCTION fused trainer (gan.train_folds_indexed at the
   flagship bench shapes) and reads XLA's cost analysis of the compiled
   executable — flops and HBM bytes accessed as the compiler scheduled them
   (post-fusion, including wgrad/Adam/RNG/gather traffic the hand model
   approximated or ignored).
2. Times the same executable (bench.py protocol) for measured updates/s.
3. Reports achieved HBM GB/s and MFU against the v5e peaks, and the
   utilization picture per (1)-vs-(2) next to the analytic model's.
4. Optionally (--trace DIR) captures a jax.profiler trace of a short run
   for op-level inspection in tensorboard/xprof.

Prints one JSON line; run on the real chip.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feat-dim", type=int, default=3632)
    ap.add_argument("--folds", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--trace", default=None,
                    help="also capture a jax.profiler trace into this dir")
    args = ap.parse_args()

    import jax

    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import compile_cache
    from mrgan_tpu.utils import rng as rng_util

    compile_cache.enable()
    n = 7200
    cfg = gan.GanConfig(epochs=args.epochs)
    rng = np.random.RandomState(0)
    x = rng.randn(n, args.feat_dim).astype(np.float32)
    y = np.tile(np.arange(6, dtype=np.int32), n // 6)
    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    jax.block_until_ready(ds.X)
    splits = protocol.stratified_splits(y, n_splits=args.folds, seed=1)
    prot_rng = np.random.RandomState(1)
    idx = [protocol.fold_indices(ds.y_host, tr, te, 100, None, 6, prot_rng)
           for tr, te in splits]
    lab, pool, train, test = (np.stack([f[i] for f in idx]) for i in range(4))
    keys = rng_util.make_keys(0, args.folds)

    fn = jax.jit(lambda *a: gan.train_folds_indexed(
        *a, valid_dim=ds.valid_dim, cfg=cfg))
    lowered = fn.lower(keys, ds.X, ds.y, lab, pool, train, test)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]

    n_train = train.shape[-1]
    updates = args.folds * args.epochs * (n_train // cfg.batch_size)
    flops_total = float(cost.get("flops", float("nan")))
    bytes_total = float(cost.get("bytes accessed", float("nan")))

    # measured wall time of the same executable
    out = compiled(keys, ds.X, ds.y, lab, pool, train, test)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = compiled(keys, ds.X, ds.y, lab, pool, train, test)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ups = updates / dt

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(
                compiled(keys, ds.X, ds.y, lab, pool, train, test))

    flops_per_update = flops_total / updates
    bytes_per_update = bytes_total / updates
    achieved_tflops = ups * flops_per_update / 1e12
    achieved_gbps = ups * bytes_per_update / 1e9
    rec = {
        "metric": "measured_roofline_fused_gan_update",
        "updates_per_s": round(ups, 1),
        "xla_flops_per_update": round(flops_per_update / 1e9, 3),
        "xla_flops_unit": "GFLOP/update (XLA cost analysis of the compiled "
                          "executable)",
        "xla_bytes_per_update_mb": round(bytes_per_update / 1e6, 1),
        "achieved_tflops": round(achieved_tflops, 2),
        "achieved_hbm_gbps": round(achieved_gbps, 1),
        "mfu_pct": round(100 * achieved_tflops / V5E_BF16_TFLOPS, 2),
        "hbm_roofline_pct": round(100 * achieved_gbps / V5E_HBM_GBPS, 1),
        "arithmetic_intensity_flop_per_byte":
            round(flops_per_update / bytes_per_update, 1),
        "wall_s": round(dt, 2),
        "updates": updates,
    }
    print(json.dumps(rec))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
