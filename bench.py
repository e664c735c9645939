"""Benchmark: fused semi-supervised GAN training throughput on one chip.

Measures disc+gen train steps/sec/chip at the reference's flagship shapes
(modality 5 = force+temp+mic: 7200 examples, 6-fold stratified CV ->
train 6000 / test 1200, batch 50, 120 batches/epoch, feature dim 3632 ->
padded 3712; mr_gan.py:73-234) through the production path: HBM-resident
dataset (one upload), on-device fold prep, 6 folds trained fused under vmap
as one XLA program.

Baseline: the reference runs Table 1 (294 trainings x 100 epochs x 120
batches ~= 3.5M disc+gen updates) in "several hours with a GPU"
(README.md:15). Taking 3 h as the charitable estimate gives ~327 updates/sec
on its 2017 GPU; vs_baseline is measured against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 294 * 100 * 120 / (3 * 3600.0)  # ~326.7


def main():
    # Backend-init watchdog: when the remote TPU pool is unreachable, the
    # first device touch blocks forever inside the PJRT client constructor
    # (observed during a multi-hour pool outage) — and it blocks in C, so
    # neither KeyboardInterrupt nor signal.alarm can unwind it. A daemon
    # thread + os._exit fails loudly instead of hanging whatever harness
    # invoked the benchmark.
    import os
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(300):
            print("bench: backend init timed out (TPU pool unreachable?)",
                  file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import compile_cache

    jax.devices()
    init_done.set()
    compile_cache.enable()

    folds = 6
    n = 7200
    feat_dim = 3632       # modality 5 @ (4 s, 0.2 s): 3*400 + 128*19 mel
    bench_epochs = 20
    # A/B hook for the flat scan-carry layout (optim.CarryPack): the packed
    # layout won the round-2 A/B and is now the GanConfig default;
    # MRGAN_BENCH_FLAT_CARRY=0 benches the legacy many-buffer layout.
    flat = bool(int(os.environ.get("MRGAN_BENCH_FLAT_CARRY", "1")))
    cfg = gan.GanConfig(epochs=bench_epochs, flat_small_carry=flat)

    rng = np.random.RandomState(0)
    x = rng.randn(n, feat_dim).astype(np.float32)
    y = np.tile(np.arange(6, dtype=np.int32), n // 6)

    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    jax.block_until_ready(ds.X)
    prot_rng = np.random.RandomState(1)
    splits = protocol.stratified_splits(y, n_splits=folds, seed=1)
    idx = [
        protocol.fold_indices(ds.y_host, tr, te, 100, None, 6, prot_rng)
        for tr, te in splits
    ]
    lab, pool, train, test = (np.stack([f[i] for f in idx]) for i in range(4))
    from mrgan_tpu.utils import rng as rng_util

    keys = rng_util.make_keys(0, folds)

    def run():
        errs = gan.train_folds_indexed(keys, ds.X, ds.y, lab, pool, train,
                                       test, valid_dim=ds.valid_dim, cfg=cfg)
        return np.asarray(errs)

    run()  # compile + warmup
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0

    n_train = train.shape[-1]
    steps = folds * bench_epochs * (n_train // cfg.batch_size)
    value = steps / dt

    # Second north-star metric (BASELINE.md): mel/MFCC frontend throughput
    # through the PRODUCTION dispatcher (ops.mel.frontend_logmel — Pallas
    # fused kernel on TPU, GEMM elsewhere), device-resident 1 s 48 kHz audio.
    from mrgan_tpu.ops import mel as mel_ops

    audio = jax.device_put(rng.randn(512, 48000).astype(np.float32))
    jax.block_until_ready(mel_ops.frontend_logmel(audio))  # compile + warmup
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(mel_ops.frontend_logmel(audio))
    mel_ex_s = reps * audio.shape[0] / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "gan_train_steps_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "disc+gen updates/sec/chip (batch 50, feat 3632, 6-fold fused)",
                "vs_baseline": round(value / BASELINE_STEPS_PER_SEC, 2),
                "extra": {
                    "mel_frontend_examples_per_sec": round(mel_ex_s, 1),
                    "mel_frontend_unit":
                        "1 s 48 kHz waveforms/sec/chip, production dispatch",
                },
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
