"""Hardware bitwise-identity check for the flat scan-carry layout.

GanConfig.flat_small_carry (optim.CarryPack) is a pure relayout of the scan
carry — packing the small leaves (biases/BN/moments/counters) into one flat
buffer per dtype. It must not change a single bit of the training result on
the real chip (the CPU equivalence is pinned by
tests/test_gan_train.py::test_flat_small_carry_bitwise_identical; this tool
pins it on TPU, where the layout actually changes the compiled program).

Run on hardware (exits 0 on success, 1 on mismatch):
    python tools/check_flat_carry.py
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from mrgan_tpu.train import gan
    from mrgan_tpu.utils import rng as rng_util

    platform = jax.devices()[0].platform
    print(f"backend: {platform}")

    rng = np.random.RandomState(0)
    # d=1280 is the proven-safe padded width class (protocol --pad-min);
    # narrower widths (384, 640) are the known TPU-worker hang/crash shape
    # in the fused trainer — the first run of this tool wedged at d=384
    n, d, folds = 600, 1280, 2
    x = rng.randn(n, d).astype(np.float32)
    y = np.tile(np.arange(6, dtype=np.int32), n // 6)
    keys = rng_util.make_keys(0, folds)

    lab = np.stack([rng.permutation(n)[:60] for _ in range(folds)])
    pool = np.stack([rng.permutation(n)[:500] for _ in range(folds)])
    train = np.stack([rng.permutation(n)[:500] for _ in range(folds)])
    test = np.stack([rng.permutation(n)[:100] for _ in range(folds)])

    errs = {}
    for flat in (False, True):
        cfg = gan.GanConfig(epochs=5, flat_small_carry=flat)
        e = gan.train_folds_indexed(keys, x, y.copy(), lab, pool, train, test,
                                    valid_dim=d, cfg=cfg)
        errs[flat] = np.asarray(e)
        print(f"flat_small_carry={flat}: errors={errs[flat]}")

    if np.array_equal(errs[False], errs[True]):
        print("OK: flat scan-carry is bitwise identical on", platform)
        return 0
    print("MISMATCH: flat scan-carry changed the training result")
    return 1


if __name__ == "__main__":
    sys.exit(main())
