"""Serving latency/throughput bench for the deployed material classifier.

Measures end-to-end classify latency (host -> scale -> discriminator ->
host) per batch size, plus the raw-window path through the on-device mel
frontend (serve.MaterialClassifier.classify_pokes), on whatever backend is
live. Every iteration forces the device round-trip by materializing the
result on host (the tunnel otherwise under-reports by ~200x).

Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pctl(samples, q):
    return float(np.percentile(np.asarray(samples) * 1e3, q))  # ms


def bench(fn, iters, warmup=20):
    for _ in range(warmup):
        fn()
    out = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--feat-dim", type=int, default=3632,
                        help="modality-5 flagship feature width")
    parser.add_argument("--batch-sizes", type=int, nargs="+",
                        default=[1, 8, 64, 256])
    args = parser.parse_args()

    import mrgan_tpu  # noqa: F401  (honors MRGAN_PLATFORM backend pinning)
    import jax

    from mrgan_tpu import serve
    from mrgan_tpu.models import nets
    from mrgan_tpu.train import gan
    from mrgan_tpu.utils import compile_cache

    # Backend-init watchdog (same shape as bench.py): an unreachable TPU
    # pool blocks the first device touch forever inside the PJRT client
    # constructor — fail loudly instead of wedging the caller.
    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(300):
            print("serve_bench: backend init timed out (TPU pool "
                  "unreachable?)", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    compile_cache.enable()
    platform = jax.devices()[0].platform
    init_done.set()

    # Latency depends on shapes/program only, not trained values: build the
    # deployable artifact directly at the flagship width.
    cfg = gan.GanConfig()
    dp = gan.pad_dim(args.feat_dim, cfg.pad_multiple)
    disc = nets.discriminator_init(jax.random.PRNGKey(0), dp, cfg.num_classes)
    clf = serve.MaterialClassifier(
        disc, np.zeros(dp, np.float32), np.ones(dp, np.float32),
        modality=5, valid_dim=args.feat_dim)

    rng = np.random.RandomState(0)
    for bs in args.batch_sizes:
        x = rng.randn(bs, args.feat_dim).astype(np.float32)
        lat = bench(lambda: clf.predict(x), args.iters)
        print(json.dumps({
            "metric": "serve_classify_latency_ms",
            "batch": bs, "feat_dim": args.feat_dim, "platform": platform,
            "p50": round(pctl(lat, 50), 3), "p99": round(pctl(lat, 99), 3),
            "throughput_ex_per_s": round(bs / np.mean(lat), 1),
        }))
        sys.stdout.flush()

    # Raw-window path: resampled force/temp/mic windows -> on-device mel
    # frontend -> classifier (the robot-side call shape).
    for bs in [1, 64]:
        windows = dict(
            temperature=rng.randn(bs, 400).astype(np.float32),
            force0=rng.randn(bs, 400).astype(np.float32),
            force1=rng.randn(bs, 400).astype(np.float32),
            contact=rng.randn(bs, 9600).astype(np.float32),
        )
        lat = bench(lambda: clf.classify_pokes(**windows), args.iters)
        print(json.dumps({
            "metric": "serve_classify_pokes_latency_ms",
            "batch": bs, "platform": platform,
            "p50": round(pctl(lat, 50), 3), "p99": round(pctl(lat, 99), 3),
            "throughput_ex_per_s": round(bs / np.mean(lat), 1),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
