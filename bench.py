"""Benchmark: fused semi-supervised GAN training throughput on one chip.

Measures disc+gen train steps/sec/chip at the reference's flagship shapes
(modality 5 = force+temp+mic: 6000-example train pool, batch 50, 120 batches
per epoch, feature dim 3632 -> padded 3712; mr_gan.py:73-234), with the
reference's own protocol unit — 6 stratified folds — trained fused under
vmap as one XLA program.

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
    import jax

    from mrgan_tpu.train import gan

    folds = 6
    n_train = 6000
    n_lab = 6000          # 100% labeled: the heaviest cell
    n_test = 1200
    feat_dim = 3632       # modality 5 @ (4 s, 0.2 s): 3*400 + 128*19 mel
    bench_epochs = 5

    cfg = gan.GanConfig(epochs=bench_epochs)
    rng = np.random.RandomState(0)

    def mk(*shape):
        return rng.randn(*shape).astype(np.float32)

    xl, valid_dim = gan.pad_features(mk(folds, n_lab, feat_dim), cfg.pad_multiple)
    pool, _ = gan.pad_features(mk(folds, n_train, feat_dim), cfg.pad_multiple)
    xt, _ = gan.pad_features(mk(folds, n_test, feat_dim), cfg.pad_multiple)
    yl = rng.randint(0, 6, (folds, n_lab)).astype(np.int32)
    yt = rng.randint(0, 6, (folds, n_test)).astype(np.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), folds)

    # HBM-resident inputs (the north star's "stream HBM-resident batches"):
    # a sweep loads each modality's features once and reuses them across all
    # percent/fold cells, so steady-state throughput is measured with data
    # already on device.
    xl, yl, pool, xt, yt = jax.device_put((xl, yl, pool, xt, yt))
    args = (keys, xl, yl, pool, xt, yt, n_train)

    # Warmup: compile + one full run
    errs, _ = gan.train_folds(*args, valid_dim=valid_dim, cfg=cfg)
    np.asarray(errs)

    t0 = time.perf_counter()
    errs, _ = gan.train_folds(*args, valid_dim=valid_dim, cfg=cfg)
    np.asarray(errs)
    dt = time.perf_counter() - t0

    steps = folds * bench_epochs * (n_train // cfg.batch_size)
    value = steps / dt
    print(
        json.dumps(
            {
                "metric": "gan_train_steps_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "disc+gen updates/sec/chip (batch 50, feat 3632, 6-fold fused)",
                "vs_baseline": round(value / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
