"""shard_map'd fused GAN train step: sweep ("cell") x data-parallel ("data").

This is the full multi-chip training step: independent trainings ride the
"cell" mesh axis with zero communication, while within each training the
batch is sharded over the "data" axis with collectives only where the math
requires them —

- gradient pmean over "data" (the DP allreduce, rides ICI);
- generator BatchNorm statistics pmean'd across shards (nets.batchnorm_train)
  so sharded batch stats match the reference's full-batch stats
  (mr_gan.py:112);
- feature-matching moments pmean'd BEFORE the square
  (losses.loss_feature_matching), because the Salimans generator loss is
  nonlinear in the batch expectations (mr_gan.py:152-154).

With equal shard sizes this is numerically the same objective as the
reference's single-device step, just laid out across chips. Exactness caveat:
with the default ``matmul_weight_dtype="bfloat16"`` each shard's weight
gradients round to bf16 (the shadow-weight staging) BEFORE the f32 pmean, so
DP matches the single-device full-batch step to bf16-rounding tolerance, not
bitwise; set ``matmul_weight_dtype="float32"`` for exact DP==global math
(tests/test_parallel.py covers both regimes).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..models import losses, nets
from ..train import gan, optim


def _f32(tree):
    return jax.tree.map(lambda a: a.astype(jnp.float32), tree)


def dp_batch_step(pg, pd, od, og, xl, yl, xu, xu2, key, *, cfg: gan.GanConfig,
                  mask=None, axis_name="data"):
    """One fused disc+gen update on a batch shard; collectives over
    ``axis_name``. Mirrors train.gan.batch_step (mr_gan.py:204-213 semantics)
    with the three DP collectives documented in the module docstring."""
    bs = xl.shape[0]  # local shard size
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    k_z1, k_z2, k_d, k_g = jax.random.split(key, 4)

    adam = partial(optim.update, lr=cfg.lr, b1=cfg.beta1,
                   stride=2 if cfg.shared_adam_step else 1)
    # bf16 shadow weights, matching train.gan.batch_step: this step is
    # stateless per call, so the shadows are derived from the masters at
    # entry (same value the single-chip trainer carries between steps —
    # mm_shadow of the post-Adam masters), keeping the two paths
    # semantically identical.
    use_sh = cfg.matmul_weight_dtype == "bfloat16"
    pg_sh = optim.mm_shadow(pg) if use_sh else pg
    pd_sh = optim.mm_shadow(pd) if use_sh else pd

    def disc_fwd(pd_, x, k):
        return nets.discriminator_apply(pd_, x, k, train=True, in_mask=mask)

    z1 = jax.random.normal(k_z1, (bs, cfg.noise_size))
    x_fake = nets.generator_apply(pg_sh, z1, out_mask=mask,
                                  axis_name=axis_name)

    def d_loss(pd_):
        # Fused 3-batch forward (see train.gan.batch_step docstring).
        logits, _ = disc_fwd(pd_, jnp.concatenate([xl, xu, x_fake]), k_d)
        logits_lab, logits_unl, logits_fake = jnp.split(logits, 3)
        ll = losses.loss_labeled(logits_lab, yl)
        lu = losses.loss_unlabeled(logits_unl, logits_fake)
        terr = losses.error_rate(logits_lab, yl)
        return ll + cfg.unlabeled_weight * lu, (ll, lu, terr)

    d_grads, (ll, lu, terr) = jax.grad(d_loss, has_aux=True)(pd_sh)
    if axis_name is not None:
        # Shadow-path grads arrive bf16; reduce across shards in f32 so the
        # DP mean doesn't lose low bits on top of the (validated) bf16
        # rounding of each shard's contribution.
        d_grads = jax.lax.pmean(_f32(d_grads), axis_name)
    pd, od = adam(d_grads, od, pd)
    pd_sh = optim.mm_shadow(pd) if use_sh else pd

    z2 = jax.random.normal(k_z2, (bs, cfg.noise_size))

    def g_loss(pg_):
        xf = nets.generator_apply(pg_, z2, out_mask=mask, axis_name=axis_name)
        _, mid = disc_fwd(pd_sh, jnp.concatenate([xf, xu2]), k_g)
        mid_fake, mid_real = jnp.split(mid, 2)
        return losses.loss_feature_matching(mid_fake, mid_real,
                                            axis_name=axis_name)

    g_grads = jax.grad(g_loss)(pg_sh)
    if axis_name is not None:
        g_grads = jax.lax.pmean(_f32(g_grads), axis_name)
    pg, og = adam(g_grads, og, pg)

    metrics = {"loss_lab": ll, "loss_unl": lu, "train_err": terr}
    if axis_name is not None:
        metrics = jax.lax.pmean(metrics, axis_name)
    return pg, pd, od, og, metrics


@lru_cache(maxsize=16)
def make_sweep_dp_step(cfg: gan.GanConfig, mesh, valid_dim=None):
    """Build the jitted multi-chip train step.

    Call signature of the returned function:
      step(params, opt, batch, keys) with
        params = {"gen": ..., "disc": ...} pytrees, leading cell axis C
        opt    = {"d": ..., "g": ...} Adam states, leading cell axis C
        batch  = dict(xl (C,B,D) f32, yl (C,B) i32, xu (C,B,D), xu2 (C,B,D))
        keys   = (C, 2) uint32 PRNG keys (one per cell)
    C is sharded over "cell"; B over "data"; params/opt replicated over
    "data". Returns updated (params, opt, metrics).
    """
    cell = P("cell")
    cell_data = P("cell", "data")

    def local_step(params, opt, batch, keys):
        mask = None
        if valid_dim is not None:
            feat_dim = batch["xl"].shape[-1]
            mask = gan._masks(feat_dim, valid_dim)

        def per_cell(pg, pd, od, og, xl, yl, xu, xu2, key):
            return dp_batch_step(pg, pd, od, og, xl, yl, xu, xu2, key,
                                 cfg=cfg, mask=mask, axis_name="data")

        pg, pd, od, og, metrics = jax.vmap(per_cell)(
            params["gen"], params["disc"], opt["d"], opt["g"],
            batch["xl"], batch["yl"], batch["xu"], batch["xu2"],
            keys,
        )
        return {"gen": pg, "disc": pd}, {"d": od, "g": og}, metrics

    in_specs = (
        cell,                                     # params (leading cell axis)
        cell,                                     # opt
        {"xl": cell_data, "yl": cell_data, "xu": cell_data, "xu2": cell_data},
        cell,                                     # keys
    )
    out_specs = (cell, cell, cell)
    step = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)
    return jax.jit(step)


@lru_cache(maxsize=16)
def _dp_cell_trainer(shapes, valid_dim, cfg, mesh, n_pool_valid,
                     with_metrics=False):
    """jit(shard_map(vmap(_train_one_indexed)))) over the "data" axis: the
    PRODUCTION fused epoch-scan trainer (scan over epochs/batches, vmapped
    folds, shared-Adam semantics, bf16 shadow weights) run data-parallel.

    Everything arrives replicated; inside the shard each fold's batch compute
    is sharded bs/n_data rows per device with the three DP collectives
    (gradient pmean, generator-BN stats, feature-matching moments — module
    docstring). Stochastic tensors are drawn globally and sliced per shard
    (nets.discriminator_apply noise_index), so the DP trajectory reproduces
    the single-device trainer exactly up to f32 reduction order —
    tests/test_parallel.py::test_dp_cell_epoch_matches_single_device.
    """
    dp = mesh.shape["data"]

    def run(keys, X, y, lab, pool, train, test):
        def one(key, l, p, tr, te):
            err, aux = gan._train_one_indexed(
                key, X, y, l, p, tr, te, valid_dim=valid_dim, cfg=cfg,
                n_pool_valid=n_pool_valid, dp_axis="data", dp_size=dp)
            if with_metrics:
                return err, {k: v for k, v in aux.items() if k != "params"}
            return err

        return jax.vmap(one)(keys, lab, pool, train, test)

    specs = P()  # replicated in/out; params & results identical on all shards
    fn = shard_map(run, mesh=mesh,
                    in_specs=(specs,) * 7,
                    out_specs=(specs, specs) if with_metrics else specs,
                    check_vma=False)
    return jax.jit(fn)


def train_gan_cell_dp(keys, X, y, lab_idx, pool_idx, train_idx, test_idx,
                      valid_dim=None, cfg: gan.GanConfig = gan.GanConfig(),
                      mesh=None, with_metrics=False):
    """Train one sweep cell's folds with the batch dimension sharded over the
    mesh's "data" axis — the production path for cells whose data axis needs
    the mesh (SURVEY §7 hard-part 5: the 20 GB full Table-5 set). The sweep
    ("cell") axis remains the first-choice parallelism; this is for meshes
    laid out ("data",) or ("cell", "data") with data > 1.

    Same contract as train.gan.train_folds_indexed.
    """
    import numpy as np_

    if mesh is None:
        raise ValueError("train_gan_cell_dp requires a mesh with a data axis")
    if valid_dim is None:
        valid_dim = X.shape[-1]
    pool_idx, n_pool_valid = gan.pad_pool_indices(np_.asarray(pool_idx),
                                                  np_.asarray(train_idx))
    shapes = (lab_idx.shape[-1], pool_idx.shape[-1], train_idx.shape[-1],
              test_idx.shape[-1], lab_idx.shape[0])
    fn = _dp_cell_trainer(shapes, int(valid_dim), cfg, mesh, n_pool_valid,
                          with_metrics)
    return fn(keys, X, y, lab_idx, pool_idx, train_idx, test_idx)


def init_cells(key, n_cells, feat_dim, cfg: gan.GanConfig):
    """Stacked per-cell params + Adam states (leading cell axis)."""
    keys = jax.random.split(key, n_cells)
    params = jax.vmap(lambda k: gan.init_params(k, feat_dim, cfg))(keys)
    t0_d = -1 if cfg.shared_adam_step else 0
    opt = {
        "d": jax.vmap(lambda p: optim.init(p, cfg.opt_dtype, t0=t0_d))(
            params["disc"]),
        "g": jax.vmap(lambda p: optim.init(p, cfg.opt_dtype))(params["gen"]),
    }
    return params, opt
