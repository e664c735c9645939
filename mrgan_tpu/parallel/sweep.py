"""Sweep parallelism: shard stacked independent trainings across the mesh.

The reference runs its sweep cells serially (mr_gan.py:248-261). Here every
group of same-shaped work items (e.g. the 6 folds of a cell, or folds of many
modality cells padded to one feature bucket) is stacked on a leading axis and
sharded over the mesh's "cell" axis. Because the trainings are independent,
XLA partitions the vmapped program with zero collectives — linear scaling
across chips, the >20x wall-clock win of SURVEY.md §2.3.
"""

from functools import lru_cache

import numpy as np
import jax

from ..train import gan, mlp
from . import mesh as mesh_lib


def _pad_work_axis(arrs, w_padded):
    """Pad the leading work axis by repeating item 0 (results are sliced off).
    Typed PRNG key arrays aren't numpy-convertible, so they pad via jnp."""
    import jax.numpy as jnp

    out = []
    for a in arrs:
        w = a.shape[0]
        if w == w_padded:
            out.append(a)
        elif isinstance(a, np.ndarray):
            reps = np.repeat(a[:1], w_padded - w, axis=0)
            out.append(np.concatenate([a, reps], axis=0))
        else:
            reps = jnp.repeat(a[:1], w_padded - w, axis=0)
            out.append(jnp.concatenate([a, reps], axis=0))
    return out


@lru_cache(maxsize=64)
def _sharded_gan_trainer(n_train, valid_dim, cfg, mesh):
    sh = mesh_lib.cell_sharding(mesh)

    def one(key, x_labeled, y_labeled, pool, x_test, y_test):
        err, _ = gan._train_one(
            key, x_labeled, y_labeled, pool, x_test, y_test,
            n_train=n_train, valid_dim=valid_dim, cfg=cfg,
        )
        return err

    return jax.jit(
        jax.vmap(one), in_shardings=(sh,) * 6, out_shardings=sh
    )


def train_gan_work(keys, x_labeled, y_labeled, pool, x_test, y_test, n_train,
                   valid_dim=None, cfg: gan.GanConfig = gan.GanConfig(),
                   mesh=None):
    """Train W independent GAN work items sharded across the mesh.

    All arrays carry a leading work axis W (any size; padded internally to a
    multiple of the mesh's cell-axis size). Returns (W,) test errors.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if valid_dim is None:
        valid_dim = x_labeled.shape[-1]
    w = keys.shape[0]
    n_cell = mesh.shape["cell"]
    w_pad = mesh_lib.pad_to_multiple(w, n_cell)
    args = _pad_work_axis(
        [keys, x_labeled, y_labeled, pool, x_test, y_test], w_pad
    )
    fn = _sharded_gan_trainer(int(n_train), int(valid_dim), cfg, mesh)
    errs = fn(*args)
    return np.asarray(errs)[:w]


@lru_cache(maxsize=64)
def _sharded_indexed_gan_trainer(shapes, valid_dim, cfg, mesh, n_pool_valid,
                                 with_metrics=False):
    """Indexed variant: X/y replicated across the mesh (one upload), index
    vectors sharded over the cell axis — per-cell traffic is a few KB.
    ``with_metrics`` (requires cfg.track_epoch_metrics) also returns the
    per-epoch metric arrays, sharded over the cell axis like the errors."""
    sh = mesh_lib.cell_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def one(key, X, y, lab_idx, pool_idx, train_idx, test_idx):
        err, aux = gan._train_one_indexed(
            key, X, y, lab_idx, pool_idx, train_idx, test_idx,
            valid_dim=valid_dim, cfg=cfg, n_pool_valid=n_pool_valid,
        )
        if with_metrics:
            return err, {k: v for k, v in aux.items() if k != "params"}
        return err

    out_sh = (sh, sh) if with_metrics else sh
    return jax.jit(
        jax.vmap(one, in_axes=(0, None, None, 0, 0, 0, 0)),
        in_shardings=(sh, rep, rep, sh, sh, sh, sh),
        out_shardings=out_sh,
    )


def train_gan_work_indexed(keys, X, y, lab_idx, pool_idx, train_idx, test_idx,
                           valid_dim=None,
                           cfg: gan.GanConfig = gan.GanConfig(), mesh=None,
                           with_metrics=False):
    """W independent GAN work items against device-resident X, mesh-sharded.

    With ``with_metrics`` (requires cfg.track_epoch_metrics) returns
    (errors (W,), {metric: (W, epochs)}) gathered to host — this is what
    keeps ``-v`` sweeps sharded instead of falling back to a single device.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if valid_dim is None:
        valid_dim = X.shape[-1]
    pool_idx, n_pool_valid = gan.pad_pool_indices(np.asarray(pool_idx),
                                                  np.asarray(train_idx))
    w = keys.shape[0]
    w_pad = mesh_lib.pad_to_multiple(w, mesh.shape["cell"])
    idx_args = _pad_work_axis([keys, lab_idx, pool_idx, train_idx, test_idx],
                              w_pad)
    shapes = (lab_idx.shape[-1], pool_idx.shape[-1], train_idx.shape[-1],
              test_idx.shape[-1])
    fn = _sharded_indexed_gan_trainer(shapes, int(valid_dim), cfg, mesh,
                                      n_pool_valid, with_metrics)
    out = fn(idx_args[0], X, y, *idx_args[1:])
    if with_metrics:
        errs, mets = out
        return (np.asarray(errs)[:w],
                {k: np.asarray(v)[:w] for k, v in mets.items()})
    return np.asarray(out)[:w]


@lru_cache(maxsize=64)
def _sharded_mlp_trainer(valid_dim, cfg, mesh):
    sh = mesh_lib.cell_sharding(mesh)

    def one(key, x_lab, y_lab, x_test, y_test):
        err, _ = mlp._train_one(key, x_lab, y_lab, x_test, y_test,
                                valid_dim=valid_dim, cfg=cfg)
        return err

    return jax.jit(jax.vmap(one), in_shardings=(sh,) * 5, out_shardings=sh)


@lru_cache(maxsize=64)
def _sharded_indexed_mlp_trainer(shapes, valid_dim, cfg, mesh):
    """Indexed MLP variant: X/y replicated (one upload), index vectors
    sharded over the cell axis — mirrors _sharded_indexed_gan_trainer."""
    sh = mesh_lib.cell_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def one(key, X, y, lab_idx, train_idx, test_idx):
        err, _ = mlp._train_one_indexed(
            key, X, y, lab_idx, train_idx, test_idx,
            valid_dim=valid_dim, cfg=cfg)
        return err

    return jax.jit(
        jax.vmap(one, in_axes=(0, None, None, 0, 0, 0)),
        in_shardings=(sh, rep, rep, sh, sh, sh),
        out_shardings=sh,
    )


def train_mlp_work_indexed(keys, X, y, lab_idx, train_idx, test_idx,
                           valid_dim=None,
                           cfg: mlp.MlpConfig = mlp.MlpConfig(), mesh=None):
    """W independent MLP work items against device-resident X, mesh-sharded."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if valid_dim is None:
        valid_dim = X.shape[-1]
    w = keys.shape[0]
    w_pad = mesh_lib.pad_to_multiple(w, mesh.shape["cell"])
    idx_args = _pad_work_axis([keys, lab_idx, train_idx, test_idx], w_pad)
    shapes = (lab_idx.shape[-1], train_idx.shape[-1], test_idx.shape[-1])
    fn = _sharded_indexed_mlp_trainer(shapes, int(valid_dim), cfg, mesh)
    errs = fn(idx_args[0], X, y, *idx_args[1:])
    return np.asarray(errs)[:w]


def train_mlp_work(keys, x_lab, y_lab, x_test, y_test, valid_dim=None,
                   cfg: mlp.MlpConfig = mlp.MlpConfig(), mesh=None):
    """MLP analog of train_gan_work: W independent trainings, mesh-sharded."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if valid_dim is None:
        valid_dim = x_lab.shape[-1]
    w = keys.shape[0]
    w_pad = mesh_lib.pad_to_multiple(w, mesh.shape["cell"])
    args = _pad_work_axis([keys, x_lab, y_lab, x_test, y_test], w_pad)
    fn = _sharded_mlp_trainer(int(valid_dim), cfg, mesh)
    return np.asarray(fn(*args))[:w]
