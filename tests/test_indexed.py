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


def test_mesh_path_respects_byte_budget_chunking(monkeypatch):
    """The mesh-sharded fold path must also honor FOLD_LAUNCH_BYTE_BUDGET
    (chunk x n_cell work items per launch) and produce the same per-fold
    errors as the unchunked sharded launch — this is what makes the cell
    retry's halved budget effective on multi-device sweeps."""
    x, y = _blobs(seed=3)
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=3)
    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    mesh = mesh_lib.make_mesh(n_cell=2, n_data=2)
    splits = protocol.stratified_splits(y, n_splits=4, seed=5)

    def run():
        rng = np.random.RandomState(5)
        idx = [protocol.fold_indices(ds.y_host, tr, te, 5, None, 6, rng)
               for tr, te in splits]
        return protocol.run_indexed_folds(ds, idx, cfg, rng, mesh=mesh)

    want = run()
    per_fold = 4.0 * ds.X.shape[-1] * sum(
        protocol.fold_indices(
            ds.y_host, *splits[0], 5, None, 6,
            np.random.RandomState(0))[i].shape[-1] for i in (0, 1, 2, 3))
    monkeypatch.setattr(protocol, "FOLD_LAUNCH_BYTE_BUDGET", per_fold + 1)
    got = run()  # -> chunk 1 x n_cell=2 -> two sharded launches
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


# ---------------------------------------------------------------------------
# Indexed MLP trainer (device-side fold prep, mirrors the GAN indexed path)
# ---------------------------------------------------------------------------

def test_indexed_mlp_matches_host_prep():
    """run_mlp_cell's device-side scale/select must reproduce the host-prep
    path (prepare_fold + train_folds) fold for fold."""
    from mrgan_tpu.train import mlp
    from mrgan_tpu.utils import rng as rng_util

    x, y = _blobs(seed=4)
    cfg = mlp.MlpConfig(epochs=3, pad_multiple=8)
    splits = protocol.stratified_splits(y, n_splits=3, seed=2)

    rng = np.random.RandomState(0)
    folds = [protocol.prepare_fold(x[tr], y[tr], x[te], y[te], 5, None, 6, rng)
             for tr, te in splits]
    stacked = protocol.stack_folds(folds)
    valid_dim = stacked["x_labeled"].shape[-1]
    for k in ("x_labeled", "x_test"):
        stacked[k], _ = gan.pad_features(stacked[k], cfg.pad_multiple)
    keys = rng_util.make_keys(rng.randint(2**31 - 1), 3)
    want = np.asarray(mlp.train_folds(
        keys, stacked["x_labeled"], stacked["y_labeled"],
        stacked["x_test"], stacked["y_test"], valid_dim=valid_dim, cfg=cfg))

    got = mlp.run_mlp_cell(x, y, 5, cfg=cfg, seed=0, splits=splits)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_indexed_mlp_sharded_matches_unsharded():
    from mrgan_tpu.train import mlp
    from mrgan_tpu.parallel import sweep as sweep_mod

    rng0 = np.random.RandomState(6)
    y = np.tile(np.arange(6, dtype=np.int32), 60)  # balanced -> equal folds
    centers = rng0.randn(6, 40) * 3
    x = (centers[y] + rng0.randn(360, 40)).astype(np.float32)
    cfg = mlp.MlpConfig(epochs=3, pad_multiple=8)
    ds = protocol.DeviceDataset(x, y, cfg.pad_multiple)
    rng = np.random.RandomState(3)
    splits = protocol.stratified_splits(y, n_splits=4, seed=3)
    idx = [protocol.fold_indices(ds.y_host, tr, te, 5, None, 6, rng)
           for tr, te in splits]
    lab, train, test = (np.stack([f[i] for f in idx]) for i in (0, 2, 3))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)

    want = np.asarray(mlp.train_folds_indexed(
        keys, ds.X, ds.y, lab, train, test, valid_dim=ds.valid_dim, cfg=cfg))
    mesh = mesh_lib.make_mesh(n_cell=4, n_data=2)
    got = sweep_mod.train_mlp_work_indexed(
        keys, ds.X, ds.y, lab, train, test,
        valid_dim=ds.valid_dim, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mlp_loo_indexed_runner():
    from mrgan_tpu.train import mlp

    rng = np.random.RandomState(2)
    centers = rng.randn(6, 24) * 3
    objects = {}
    for m in range(6):
        for o in range(3):
            xo = centers[m] + rng.randn(8, 24).astype(np.float32)
            objects[f"mat{m}_obj{o}"] = {
                "x": xo.astype(np.float32),
                "y": np.full(8, m, np.int32),
            }
    cfg = mlp.MlpConfig(epochs=5, pad_multiple=8)
    names, errs = mlp.run_mlp_loo(objects, 100, cfg=cfg, seed=0, chunk=7)
    assert names == list(objects.keys())
    assert errs.shape == (18,)
    assert np.all((errs >= 0) & (errs <= 1))
    assert np.mean(errs) < 0.4  # separable blobs -> must actually learn


def test_mlp_with_params_returns_trained_params():
    from mrgan_tpu.models import nets
    from mrgan_tpu.train import mlp

    x, y = _blobs(seed=9)
    cfg = mlp.MlpConfig(epochs=3, pad_multiple=8)
    rng = np.random.RandomState(1)
    fold = protocol.prepare_fold(x[:300], y[:300], x[300:], y[300:], 5,
                                 None, 6, rng)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    errs, aux = mlp.train_folds(
        keys, fold["x_labeled"][None], fold["y_labeled"][None],
        fold["x_test"][None], fold["y_test"][None], cfg=cfg,
        with_params=True)
    params = jax.tree.map(lambda a: a[0], aux["params"])
    logits = nets.mlp_apply(params, fold["x_test"], train=False)
    err = np.mean(np.argmax(np.asarray(logits), 1) != fold["y_test"])
    np.testing.assert_allclose(float(errs[0]), err, atol=1e-6)


def test_device_dataset_pad_min_mismatch_raises():
    import pytest

    x, y = _blobs(seed=1)
    ds = protocol.DeviceDataset(x, y, pad_multiple=128, pad_min=0)
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=1, pad_min=1280)
    with pytest.raises(ValueError, match="pad_min"):
        protocol.run_gan_cell(ds, percentlabeled=5, cfg=cfg, n_splits=3)


def test_pad_dim_rounds_min_dim_to_lane_multiple():
    # a --pad-min that is not a multiple must not yield a misaligned width
    assert gan.pad_dim(640, 128, 1000) == 1024
    assert gan.pad_dim(640, 128, 1024) == 1024
    assert gan.pad_dim(40, 128, 0) == 128
    assert gan.pad_dim(1300, 128, 1000) == 1408
