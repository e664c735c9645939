#!/usr/bin/env python3
"""MEASURED roofline for the fused disc+gen GAN update (VERDICT r3 next #4).

tools/roofline.py models bytes/update analytically (204 MB -> "HBM-bound,
~76 % of roofline at 3.0k updates/s"). This tool replaces the spec-sheet
half of that claim with measurements from the real chip:

1. **Marginal wall per update** — the production fused trainer
   (gan.train_folds_indexed, bench.py shapes) timed at two epoch counts;
   the difference isolates steady-state update cost from compile/setup/
   fold-gather (per-epoch test eval stays amortized in, 1/120 of batches,
   exactly as production runs it).
2. **Measured HBM stream bandwidth** — a jitted scale-copy over a ~2 GB
   array (reads+writes every byte once; the same access pattern the
   HBM-bound trainer is limited by). This is the *achievable* ceiling the
   update should be judged against, not the 819 GB/s spec number.
3. **Implied bytes/update** = marginal time/update x measured stream GB/s —
   an upper bound under the bandwidth-bound hypothesis — reported against
   the analytic model's 204 MB.
4. XLA cost analysis of the compiled executable, with the measured caveat
   that XLA counts every scan body ONCE regardless of trip count (verified
   here: statics are identical at epochs=5 and 20), so those numbers are
   program-static, not per-update.
5. Optionally (--trace DIR) a jax.profiler trace of a short run.

Prints one JSON line and writes artifacts/r5/roofline_measured.json.
Run on the real chip with nothing else on it. NOTE (measured round 5):
on the axon tunnel jax.block_until_ready does NOT synchronize AOT
executables — every timing below syncs by fetching results (np.asarray),
like bench.py.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
# per-update FLOP from the analytic model (tools/roofline.py itemization);
# XLA statics can't give this (scan bodies counted once)
ANALYTIC_GFLOP_PER_UPDATE = 6.5
ANALYTIC_MB_PER_UPDATE = 204.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feat-dim", type=int, default=3632)
    ap.add_argument("--folds", type=int, default=6)
    ap.add_argument("--epochs-pair", type=int, nargs=2, default=[5, 20])
    ap.add_argument("--stream-mb", type=int, default=2048)
    ap.add_argument("--trace", default=None,
                    help="also capture a jax.profiler trace into this dir")
    ap.add_argument("--out", default="artifacts/r5/roofline_measured.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import compile_cache
    from mrgan_tpu.utils import rng as rng_util

    compile_cache.enable()
    n = 7200
    rng = np.random.RandomState(0)
    x = rng.randn(n, args.feat_dim).astype(np.float32)
    y = np.tile(np.arange(6, dtype=np.int32), n // 6)
    splits = protocol.stratified_splits(y, n_splits=args.folds, seed=1)

    # --- measured HBM stream bandwidth (read+write every byte once) ------
    buf = jax.device_put(
        rng.randn(args.stream_mb * 250_000 // 1000, 1000).astype(np.float32))
    scale = jax.jit(lambda a: a * np.float32(1.000001))
    np.asarray(scale(buf)[0, :1])  # compile + warmup (fetch-sync)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = scale(buf)
    np.asarray(out[0, :1])
    stream_dt = (time.perf_counter() - t0) / reps
    stream_bytes = 2 * buf.size * 4
    stream_gbps = stream_bytes / stream_dt / 1e9

    # --- marginal wall per update at two epoch counts --------------------
    walls, updates = {}, {}
    statics = {}
    for epochs in args.epochs_pair:
        cfg = gan.GanConfig(epochs=epochs)
        ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
        np.asarray(jnp.sum(ds.X))  # sync upload
        idx = [protocol.fold_indices(ds.y_host, tr, te, 100, None, 6,
                                     np.random.RandomState(1))
               for tr, te in splits]
        lab, pool, train, test = (np.stack([f[i] for f in idx])
                                  for i in range(4))
        keys = rng_util.make_keys(0, args.folds)

        def run():
            errs = gan.train_folds_indexed(
                keys, ds.X, ds.y, lab, pool, train, test,
                valid_dim=ds.valid_dim, cfg=cfg)
            return np.asarray(errs)  # fetch-sync (see module docstring)

        run()  # compile + warmup
        t0 = time.perf_counter()
        run()
        walls[epochs] = time.perf_counter() - t0
        n_train = train.shape[-1]
        updates[epochs] = args.folds * epochs * (n_train // cfg.batch_size)

        pool_p, npv = gan.pad_pool_indices(pool, train)
        shapes = (lab.shape[-1], pool_p.shape[-1], train.shape[-1],
                  test.shape[-1])
        fn = gan._compiled_indexed_trainer(shapes, int(ds.valid_dim), cfg,
                                           npv)
        cost = fn.lower(keys, ds.X, ds.y, lab, pool_p, train,
                        test).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        statics[epochs] = {"flops": float(cost.get("flops", float("nan"))),
                           "bytes": float(cost.get("bytes accessed",
                                                   float("nan")))}
        if args.trace and epochs == args.epochs_pair[0]:
            with jax.profiler.trace(args.trace):
                run()

    e1, e2 = args.epochs_pair
    d_wall = walls[e2] - walls[e1]
    d_upd = updates[e2] - updates[e1]
    s_per_update = d_wall / d_upd
    ups = 1.0 / s_per_update
    implied_mb = s_per_update * stream_gbps * 1e9 / 1e6
    implied_mb_spec = s_per_update * V5E_HBM_GBPS * 1e9 / 1e6
    achieved_tflops = ups * ANALYTIC_GFLOP_PER_UPDATE / 1e3

    rec = {
        "metric": "measured_roofline_fused_gan_update",
        "marginal_updates_per_s": round(ups, 1),
        "walls_s": {str(k): round(v, 3) for k, v in walls.items()},
        "updates": updates and {str(k): v for k, v in updates.items()},
        "measured_stream_gbps": round(stream_gbps, 1),
        "stream_pct_of_spec": round(100 * stream_gbps / V5E_HBM_GBPS, 1),
        "implied_bytes_per_update_mb_at_measured_bw": round(implied_mb, 1),
        "implied_bytes_per_update_mb_at_spec_bw": round(implied_mb_spec, 1),
        "analytic_bytes_per_update_mb": ANALYTIC_MB_PER_UPDATE,
        "hbm_roofline_pct_vs_measured_stream": round(
            100 * ANALYTIC_MB_PER_UPDATE / implied_mb, 1),
        "mfu_pct_analytic_flops": round(
            100 * achieved_tflops / V5E_BF16_TFLOPS, 2),
        "xla_static_cost_analysis_scan_bodies_counted_once": {
            str(k): {"gflops": round(v["flops"] / 1e9, 2),
                     "gbytes": round(v["bytes"] / 1e9, 2)}
            for k, v in statics.items()},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
