"""Supervised MLP baseline trainer (mr_nn.py:69-119).

Keras-semantics: MSE loss against one-hot targets, Adam(lr=1e-3), batch 20,
100 epochs, per-epoch shuffle, GaussianNoise regularization active only in
training. Like the GAN trainer, a whole fold-stack trains as one fused
scan-over-epochs/scan-over-batches XLA program under vmap.
"""

import dataclasses
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..models import nets
from . import gan as gan_mod
from . import optim


@dataclasses.dataclass(frozen=True)
class MlpConfig:
    batch_size: int = 20     # mr_nn.py:117
    epochs: int = 100
    lr: float = 1e-3         # keras Adam default (mr_nn.py:114)
    beta1: float = 0.9
    num_classes: int = 6
    pad_multiple: int = 128
    pad_min: int = 0
    # pad_min buckets narrow feature widths up to a proven-safe width, same
    # as gan.GanConfig.pad_min: the deterministic TPU backend fault on
    # narrow widths (observed at 640, STATUS.md) hits this trainer too.
    matmul_weight_dtype: str = "bfloat16"
    # bf16 shadow weights for the matmul passes, exactly as in
    # gan.GanConfig.matmul_weight_dtype (bitwise-identical dots on the MXU;
    # dW rounds to bf16 before the f32 Adam math). The batch-20 MLP step is
    # even more weight-streaming-bound than the GAN's.
    flat_small_carry: bool = False
    # Pack sub-matrix scan-carry leaves into one flat buffer per dtype
    # (optim.CarryPack) — bitwise-identical relayout, same rationale and
    # default as gan.GanConfig.flat_small_carry.


def _train_one(key, x_lab, y_lab, x_test, y_test, *, valid_dim, cfg: MlpConfig):
    feat_dim = x_lab.shape[-1]
    n = x_lab.shape[0]
    bs = cfg.batch_size
    nb = n // bs
    mask = gan_mod._masks(feat_dim, valid_dim)
    y_onehot = jax.nn.one_hot(y_lab, cfg.num_classes)

    k_init, k_run = jax.random.split(key)
    params = nets.mlp_init(k_init, feat_dim, cfg.num_classes)
    opt = optim.init(params)
    use_sh = cfg.matmul_weight_dtype == "bfloat16"

    def batch_step(carry, inputs):
        if use_sh:
            params, opt, p_sh = carry
        else:
            params, opt = carry
            p_sh = params
        xb, yb, k = inputs

        def loss_fn(p):
            logits = nets.mlp_apply(p, xb, k, train=True, in_mask=mask)
            return jnp.mean(jnp.square(logits - yb))

        loss, grads = jax.value_and_grad(loss_fn)(p_sh)
        params, opt = optim.update(grads, opt, params, lr=cfg.lr, b1=cfg.beta1)
        if use_sh:
            return (params, opt, optim.mm_shadow(params)), loss
        return (params, opt), loss

    carry0 = (params, opt)
    if use_sh:
        carry0 += (optim.mm_shadow(params),)
    if cfg.flat_small_carry:
        packer = optim.CarryPack(carry0)
        carry0 = packer.pack(carry0)

        def scan_step(carry_p, inputs):
            carry, out = batch_step(packer.unpack(carry_p), inputs)
            return packer.pack(carry), out
    else:
        packer = None
        scan_step = batch_step

    def epoch_body(carry, k_epoch):
        # NOTE: the epoch batch tensor is materialized up front, unlike the
        # GAN trainer's in-scan gathers — measured on v5e the in-scan gather
        # variant was ~3x SLOWER here (batch-20 row gathers under vmap lower
        # poorly), while at the GAN's fused 150-row batches it was a win.
        k_perm, k_steps = jax.random.split(k_epoch)
        perm = jax.random.permutation(k_perm, n)[: nb * bs]
        xb = x_lab[perm].reshape(nb, bs, feat_dim)
        yb = y_onehot[perm].reshape(nb, bs, cfg.num_classes)
        keys = jax.random.split(k_steps, nb)
        carry, losses_ = jax.lax.scan(scan_step, carry, (xb, yb, keys))
        return carry, jnp.mean(losses_)

    carry, _ = jax.lax.scan(
        epoch_body, carry0, jax.random.split(k_run, cfg.epochs)
    )
    if packer is not None:
        carry = packer.unpack(carry)
    params = carry[0]
    logits = nets.mlp_apply(params, x_test, train=False)
    err = jnp.mean(jnp.argmax(logits, axis=1) != y_test)
    return err, {"params": params}


def _train_one_indexed(key, X, y, lab_idx, train_idx, test_idx,
                       *, valid_dim, cfg: MlpConfig):
    """Device-side fold prep + training against an HBM-resident dataset.

    Mirrors gan._train_one_indexed: the reference re-fits StandardScaler on
    the full train fold and selects the labeled subset on host for every cell
    (mr_nn.py:87-94); profiling showed those host-side fold stacks left the
    device ~90% idle on wide-feature LOO cells (~600 MB upload per launch).
    Here X is uploaded once per modality and each cell ships only index
    vectors; scaling stats, gathers and selection run inside the jit.
    """
    mean, inv = gan_mod.scale_stats(X[train_idx])

    def scale(a):
        return (a - mean) * inv

    return _train_one(
        key, scale(X[lab_idx]), y[lab_idx], scale(X[test_idx]), y[test_idx],
        valid_dim=valid_dim, cfg=cfg,
    )


@lru_cache(maxsize=64)
def _compiled(valid_dim, cfg, with_params=False):
    def one(key, x_lab, y_lab, x_test, y_test):
        err, aux = _train_one(key, x_lab, y_lab, x_test, y_test,
                              valid_dim=valid_dim, cfg=cfg)
        return (err, aux) if with_params else err

    return jax.jit(jax.vmap(one))


@lru_cache(maxsize=64)
def _compiled_indexed(shapes, valid_dim, cfg, with_params=False):
    def one(key, X, y, lab_idx, train_idx, test_idx):
        err, aux = _train_one_indexed(key, X, y, lab_idx, train_idx, test_idx,
                                      valid_dim=valid_dim, cfg=cfg)
        return (err, aux) if with_params else err

    return jax.jit(jax.vmap(one, in_axes=(0, None, None, 0, 0, 0)))


def train_folds(keys, x_lab, y_lab, x_test, y_test, valid_dim=None,
                cfg: MlpConfig = MlpConfig(), with_params=False):
    """Train F folds fused; returns (F,) errors, or (errors, aux) with the
    trained parameter stacks when ``with_params`` (used by the activation-map
    analysis — one trainer code path, no inline duplicates)."""
    if valid_dim is None:
        valid_dim = x_lab.shape[-1]
    return _compiled(int(valid_dim), cfg, with_params)(
        keys, x_lab, y_lab, x_test, y_test)


def train_folds_indexed(keys, X, y, lab_idx, train_idx, test_idx,
                        valid_dim=None, cfg: MlpConfig = MlpConfig(),
                        with_params=False):
    """Train F folds against a device-resident (N, D) dataset from (F, *)
    int32 index vectors (device-side scale/select)."""
    if valid_dim is None:
        valid_dim = X.shape[-1]
    shapes = (lab_idx.shape[-1], train_idx.shape[-1], test_idx.shape[-1])
    fn = _compiled_indexed(shapes, int(valid_dim), cfg, with_params)
    return fn(keys, X, y, lab_idx, train_idx, test_idx)


def _run_indexed(ds, idx, cfg, rng, mesh=None):
    """Stack (lab, train, test) index tuples and train fused/sharded."""
    from . import protocol
    from ..utils import rng as rng_util

    lab, train, test = (np.stack([f[i] for f in idx]) for i in range(3))
    keys = rng_util.make_keys(rng.randint(2**31 - 1), len(idx))
    # Same per-launch byte budget as the GAN path (protocol.
    # run_indexed_folds): 6 fused folds x the widest Table-5 audio features
    # gather >5 GB and crash the TPU worker; chunked launches stay at the
    # proven point (no pool gathers here, so n_pool=0). The budget is per
    # device, so the mesh-sharded path chunks at (chunk x n_cell) — also
    # what makes the halved-budget cell retry effective there.
    chunk = protocol._fold_launch_chunk(
        len(idx), int(ds.X.shape[-1]), lab.shape[-1], 0, train.shape[-1],
        test.shape[-1])
    if mesh is not None and mesh.shape.get("cell", 1) > 1:
        from ..parallel import sweep

        chunk *= mesh.shape["cell"]
        errs = [
            sweep.train_mlp_work_indexed(
                keys[s:s + chunk], ds.X, ds.y, lab[s:s + chunk],
                train[s:s + chunk], test[s:s + chunk],
                valid_dim=ds.valid_dim, cfg=cfg, mesh=mesh)
            for s in range(0, len(idx), chunk)
        ]
        return np.concatenate(errs)
    errs = [
        np.asarray(train_folds_indexed(
            keys[s:s + chunk], ds.X, ds.y, lab[s:s + chunk],
            train[s:s + chunk], test[s:s + chunk],
            valid_dim=ds.valid_dim, cfg=cfg))
        for s in range(0, len(idx), chunk)
    ]
    return np.concatenate(errs)


def run_mlp_loo(objects, percentlabeled, cfg: MlpConfig = MlpConfig(), seed=0,
                mesh=None, chunk=None):
    """Leave-one-object-out MLP protocol (mr_nn.py:148-168): the 72 splits
    share static shapes, so they stack on a work axis and train fused against
    ONE device-resident copy of the data (and mesh-sharded when a multi-device
    mesh is given), in chunks of 6 work items per device
    (protocol.loo_chunk)."""
    from . import protocol

    rng = np.random.RandomState(seed)
    names = list(objects.keys())
    x_all = np.concatenate([np.asarray(objects[n]["x"]) for n in names], 0)
    y_all = np.concatenate([np.asarray(objects[n]["y"]) for n in names], 0)
    offs = np.cumsum([0] + [len(objects[n]["y"]) for n in names])
    ds = protocol.DeviceDataset(x_all, y_all, cfg.pad_multiple, mesh=mesh,
                                pad_min=cfg.pad_min)

    if chunk is None:
        chunk = protocol.loo_chunk(len(names), mesh)
    errors = []
    for block, idx, n_real in protocol.iter_loo_blocks(
            names, offs, ds.y_host, percentlabeled, cfg.num_classes, rng,
            chunk):
        idx = [(lab, tr, te) for lab, _pool, tr, te in idx]
        errs = _run_indexed(ds, idx, cfg, rng, mesh=mesh)[:n_real]
        errors.extend(float(e) for e in errs)
    return names, np.asarray(errors)


def run_mlp_cell(x, y=None, percentlabeled=100, cfg: MlpConfig = MlpConfig(),
                 seed=0, n_splits=6, splits=None, mesh=None):
    """mr_nn.py table cell: k folds fused against a device-resident dataset;
    returns per-fold test errors. ``x`` may be a protocol.DeviceDataset."""
    from . import protocol

    rng = np.random.RandomState(seed)
    ds = x if isinstance(x, protocol.DeviceDataset) else protocol.DeviceDataset(
        x, y, cfg.pad_multiple, mesh=mesh, pad_min=cfg.pad_min)
    required = gan_mod.pad_dim(ds.valid_dim, cfg.pad_multiple, cfg.pad_min)
    if ds.X.shape[-1] < required:
        # same guard as protocol.run_gan_cell: a pre-built DeviceDataset
        # narrower than cfg.pad_min would silently drop the narrow-width
        # bucketing (the known TPU backend-fault class)
        raise ValueError(
            f"DeviceDataset was built with padded width {ds.X.shape[-1]} "
            f"but cfg.pad_min={cfg.pad_min} requires width >= {required}; "
            "rebuild the DeviceDataset with pad_min=cfg.pad_min.")
    if splits is None:
        splits = protocol.stratified_splits(ds.y_host, n_splits=n_splits,
                                            seed=seed)
    idx = []
    for tr, te in splits:
        lab, _pool, tr_i, te_i = protocol.fold_indices(
            ds.y_host, tr, te, percentlabeled, None, cfg.num_classes, rng)
        idx.append((lab, tr_i, te_i))
    return _run_indexed(ds, idx, cfg, rng, mesh=mesh)
