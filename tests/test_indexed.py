"""Tests for the HBM-resident indexed fold path (DeviceDataset +
gan.train_folds_indexed): on-device scaling matches sklearn semantics, the
sharded and unsharded indexed trainers agree exactly, and the LOO runner
produces one error per object."""

import numpy as np
import jax

from mrgan_tpu.parallel import mesh as mesh_lib
from mrgan_tpu.parallel import sweep
from mrgan_tpu.train import gan, protocol


def test_scale_stats_matches_sklearn_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(200, 17).astype(np.float32) * 3 + 1
    x[:, 5] = 2.0  # zero-variance column passes through
    mean, inv = jax.jit(gan.scale_stats)(x)
    want_tr, _ = protocol.scale_fold(x, x[:10])
    got = (x - np.asarray(mean)) * np.asarray(inv)
    np.testing.assert_allclose(got, want_tr, atol=1e-4)


def _blobs(n=360, d=40, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 6, n).astype(np.int32)
    centers = rng.randn(6, d) * 3
    x = centers[y] + rng.randn(n, d).astype(np.float32)
    return x.astype(np.float32), y


def test_indexed_cell_learns_blobs():
    x, y = _blobs()
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=20)
    errs = protocol.run_gan_cell(x, y, percentlabeled=5, cfg=cfg, seed=1,
                                 n_splits=3)
    assert errs.shape == (3,)
    assert np.mean(errs) < 0.35


def test_indexed_sharded_matches_unsharded():
    x, y = _blobs(seed=3)
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=3)
    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    rng = np.random.RandomState(5)
    splits = protocol.stratified_splits(y, n_splits=4, seed=5)
    idx = [
        protocol.fold_indices(ds.y_host, tr, te, 5, None, 6, rng)
        for tr, te in splits
    ]
    lab, pool, train, test = (np.stack([f[i] for f in idx]) for i in range(4))
    keys = jax.random.split(jax.random.PRNGKey(9), 4)

    want = np.asarray(
        gan.train_folds_indexed(keys, ds.X, ds.y, lab, pool, train, test,
                                valid_dim=ds.valid_dim, cfg=cfg)
    )
    mesh = mesh_lib.make_mesh(n_cell=4, n_data=2)
    got = sweep.train_gan_work_indexed(keys, ds.X, ds.y, lab, pool, train,
                                       test, valid_dim=ds.valid_dim, cfg=cfg,
                                       mesh=mesh)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_indexed_loo_runner():
    rng = np.random.RandomState(2)
    centers = rng.randn(6, 24) * 3
    objects = {}
    for m in range(6):
        for o in range(3):
            x = centers[m] + rng.randn(8, 24).astype(np.float32)
            objects[f"mat{m}_obj{o}"] = {
                "x": x.astype(np.float32),
                "y": np.full(8, m, np.int32),
            }
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=5)
    seen = []
    names, errs = protocol.run_gan_loo(
        objects, 100, cfg=cfg, seed=0, chunk=7,
        on_result=lambda n, e: seen.append(n),
    )
    assert names == list(objects.keys())
    assert errs.shape == (18,)
    assert seen == names
    assert np.all((errs >= 0) & (errs <= 1))


def test_fold_launch_chunking_matches_single_launch(monkeypatch):
    """Byte-budgeted fold chunking (the wide-feature worker-crash dodge) must
    return the same per-fold errors as one fused launch: each fold's key and
    indices are independent of launch grouping."""
    rng0 = np.random.RandomState(11)
    y = np.tile(np.arange(6, dtype=np.int32), 60)  # balanced -> equal folds
    centers = rng0.randn(6, 40) * 3
    x = (centers[y] + rng0.randn(360, 40)).astype(np.float32)
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=3)
    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    splits = protocol.stratified_splits(y, n_splits=4, seed=7)

    def run():
        rng = np.random.RandomState(7)
        idx = [protocol.fold_indices(ds.y_host, tr, te, 5, None, 6, rng)
               for tr, te in splits]
        return protocol.run_indexed_folds(ds, idx, cfg, rng)

    want = run()
    monkeypatch.setattr(protocol, "FOLD_LAUNCH_BYTE_BUDGET", 1.0)  # -> width 1
    got = run()
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (4,)


def test_fold_launch_chunk_sizing():
    # reference shapes stay one fused launch of 6
    assert protocol._fold_launch_chunk(6, 3712, 6000, 6000, 6000, 1200) == 6
    # table-5 audio width splits into balanced launches of <=3
    c = protocol._fold_launch_chunk(6, 12032, 6000, 6000, 6000, 1200)
    assert c == 3
    # never below 1
    assert protocol._fold_launch_chunk(6, 10**9, 6000, 6000, 6000, 1200) == 1


def test_pool_padding_is_semantically_inert():
    """The TPU-fault workaround (pad pool indices to train width with a
    static n_pool_valid) must not change the math: padded and unpadded
    programs produce identical errors for the same keys."""
    rng0 = np.random.RandomState(8)
    y = np.tile(np.arange(6, dtype=np.int32), 60)  # balanced classes
    centers = rng0.randn(6, 30) * 3
    x = (centers[y] + rng0.randn(360, 30)).astype(np.float32)
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=3)
    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    rng = np.random.RandomState(1)
    splits = protocol.stratified_splits(y, n_splits=3, seed=1)
    idx = [
        protocol.fold_indices(ds.y_host, tr, te, 1, 2, 6, rng)  # subset pool
        for tr, te in splits
    ]
    lab, pool, train, test = (np.stack([f[i] for f in idx]) for i in range(4))
    assert pool.shape[-1] < train.shape[-1]
    keys = jax.random.split(jax.random.PRNGKey(4), 3)

    # production path (pads internally)
    got = np.asarray(gan.train_folds_indexed(
        keys, ds.X, ds.y, lab, pool, train, test,
        valid_dim=ds.valid_dim, cfg=cfg))

    # direct unpadded program
    def one(key, lab_i, pool_i, train_i, test_i):
        err, _ = gan._train_one_indexed(
            key, ds.X, ds.y, lab_i, pool_i, train_i, test_i,
            valid_dim=ds.valid_dim, cfg=cfg)
        return err

    want = np.asarray(jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0)))(
        keys, lab, pool, train, test))
    np.testing.assert_allclose(got, want, atol=1e-6)
