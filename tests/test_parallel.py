"""Multi-device tests (8 virtual CPU devices via conftest).

Verifies the three DP collectives are semantically exact (sharded == global
math), that sweep sharding is a pure layout change (same numbers as the
unsharded vmap path), and that the full shard_map'd train step runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mrgan_tpu.models import losses, nets
from mrgan_tpu.parallel import mesh as mesh_lib
from mrgan_tpu.parallel import spmd, sweep
from mrgan_tpu.train import gan


def _mesh(n_cell, n_data):
    return mesh_lib.make_mesh(n_cell=n_cell, n_data=n_data)


def test_batchnorm_dp_matches_global():
    mesh = _mesh(1, 4)
    x = np.random.RandomState(0).randn(32, 16).astype(np.float32)
    p = nets.batchnorm_init(16)
    want = nets.batchnorm_train(p, x)

    def local(x):
        return nets.batchnorm_train(p, x, axis_name="data")

    got = jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_feature_matching_dp_matches_global():
    mesh = _mesh(1, 4)
    rng = np.random.RandomState(1)
    a = rng.randn(32, 24).astype(np.float32)
    b = rng.randn(32, 24).astype(np.float32)
    want = losses.loss_feature_matching(a, b)

    def local(a, b):
        return losses.loss_feature_matching(a, b, axis_name="data")

    got = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )
    )(a, b)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_sweep_sharded_gan_matches_vmap():
    """Sharding the work axis across the mesh must not change the numbers."""
    cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=2, pad_multiple=1)
    rng = np.random.RandomState(0)
    w, n_lab, n_pool, n_test, d = 4, 30, 60, 20, 32
    keys = jax.random.split(jax.random.PRNGKey(7), w)
    xl = rng.randn(w, n_lab, d).astype(np.float32)
    yl = rng.randint(0, 6, (w, n_lab)).astype(np.int32)
    pool = rng.randn(w, n_pool, d).astype(np.float32)
    xt = rng.randn(w, n_test, d).astype(np.float32)
    yt = rng.randint(0, 6, (w, n_test)).astype(np.int32)
    n_train = 60

    ref_errs, _ = gan.train_folds(keys, xl, yl, pool, xt, yt, n_train, cfg=cfg)
    mesh = _mesh(4, 2)
    got = sweep.train_gan_work(keys, xl, yl, pool, xt, yt, n_train,
                               cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(got, np.asarray(ref_errs), atol=1e-6)


def test_sweep_dp_step_runs_and_updates():
    mesh = _mesh(2, 4)
    cfg = gan.GanConfig(noise_size=8, batch_size=4, epochs=1)
    n_cells, d = 4, 64
    batch = cfg.batch_size * 4  # global batch spans the data axis
    params, opt = spmd.init_cells(jax.random.PRNGKey(0), n_cells, d, cfg)
    rng = np.random.RandomState(0)
    batch_arrays = {
        "xl": rng.randn(n_cells, batch, d).astype(np.float32),
        "yl": rng.randint(0, 6, (n_cells, batch)).astype(np.int32),
        "xu": rng.randn(n_cells, batch, d).astype(np.float32),
        "xu2": rng.randn(n_cells, batch, d).astype(np.float32),
    }
    keys = jax.random.split(jax.random.PRNGKey(1), n_cells)
    step = spmd.make_sweep_dp_step(cfg, mesh, valid_dim=50)
    new_params, new_opt, metrics = step(params, opt, batch_arrays, keys)

    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    before = np.asarray(params["disc"]["d0"]["w"])
    after = np.asarray(new_params["disc"]["d0"]["w"])
    assert not np.allclose(before, after)
    # padded (masked) input columns must stay frozen at init
    np.testing.assert_array_equal(before[50:], after[50:])


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (50, 6)
    g.dryrun_multichip(8)
