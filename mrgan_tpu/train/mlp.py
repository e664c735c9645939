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
    matmul_weight_dtype: str = "bfloat16"
    # bf16 shadow weights for the matmul passes, exactly as in
    # gan.GanConfig.matmul_weight_dtype (bitwise-identical dots on the MXU;
    # dW rounds to bf16 before the f32 Adam math). The batch-20 MLP step is
    # even more weight-streaming-bound than the GAN's.


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
        carry, losses_ = jax.lax.scan(batch_step, carry, (xb, yb, keys))
        return carry, jnp.mean(losses_)

    carry0 = (params, opt)
    if use_sh:
        carry0 += (optim.mm_shadow(params),)
    carry, _ = jax.lax.scan(
        epoch_body, carry0, jax.random.split(k_run, cfg.epochs)
    )
    params = carry[0]
    logits = nets.mlp_apply(params, x_test, train=False)
    return jnp.mean(jnp.argmax(logits, axis=1) != y_test)


@lru_cache(maxsize=64)
def _compiled(valid_dim, cfg):
    def one(key, x_lab, y_lab, x_test, y_test):
        return _train_one(key, x_lab, y_lab, x_test, y_test,
                          valid_dim=valid_dim, cfg=cfg)

    return jax.jit(jax.vmap(one))


def train_folds(keys, x_lab, y_lab, x_test, y_test, valid_dim=None,
                cfg: MlpConfig = MlpConfig()):
    if valid_dim is None:
        valid_dim = x_lab.shape[-1]
    return _compiled(int(valid_dim), cfg)(keys, x_lab, y_lab, x_test, y_test)


def run_mlp_loo(objects, percentlabeled, cfg: MlpConfig = MlpConfig(), seed=0,
                mesh=None, chunk=6):
    """Leave-one-object-out MLP protocol (mr_nn.py:148-168): the 72 splits
    share static shapes, so they stack on a work axis and train fused (and
    mesh-sharded when a multi-device mesh is given), in chunks."""
    from . import protocol

    rng = np.random.RandomState(seed)
    names = list(objects.keys())
    errors = []
    for s in range(0, len(names), chunk):
        block = names[s : s + chunk]
        folds = [
            protocol.prepare_fold(*protocol._loo_split(objects, n),
                                  percentlabeled, None, cfg.num_classes, rng)
            for n in block
        ]
        n_real = len(folds)
        while len(folds) < min(chunk, len(names)):
            folds.append(folds[0])
        stacked = protocol.stack_folds(folds)
        valid_dim = stacked["x_labeled"].shape[-1]
        for k in ("x_labeled", "x_test"):
            stacked[k], _ = gan_mod.pad_features(stacked[k], cfg.pad_multiple)
        from ..utils import rng as rng_util

        keys = rng_util.make_keys(rng.randint(2**31 - 1), len(folds))
        args = (keys, stacked["x_labeled"], stacked["y_labeled"],
                stacked["x_test"], stacked["y_test"])
        if mesh is not None and mesh.shape.get("cell", 1) > 1:
            from ..parallel import sweep

            errs = sweep.train_mlp_work(*args, valid_dim=valid_dim, cfg=cfg,
                                        mesh=mesh)
        else:
            errs = train_folds(*args, valid_dim=valid_dim, cfg=cfg)
        errors.extend(float(e) for e in np.asarray(errs)[:n_real])
    return names, np.asarray(errors)


def run_mlp_cell(x, y, percentlabeled, cfg: MlpConfig = MlpConfig(), seed=0,
                 n_splits=6, splits=None):
    """mr_nn.py table cell: k folds fused; returns per-fold test errors."""
    from . import protocol

    rng = np.random.RandomState(seed)
    if splits is None:
        splits = protocol.stratified_splits(y, n_splits=n_splits, seed=seed)
    folds = [
        protocol.prepare_fold(x[tr], y[tr], x[te], y[te], percentlabeled,
                              None, cfg.num_classes, rng)
        for tr, te in splits
    ]
    stacked = protocol.stack_folds(folds)
    valid_dim = stacked["x_labeled"].shape[-1]
    for k in ("x_labeled", "x_test"):
        stacked[k], _ = gan_mod.pad_features(stacked[k], cfg.pad_multiple)
    from ..utils import rng as rng_util

    keys = rng_util.make_keys(rng.randint(2**31 - 1), len(folds))
    errs = train_folds(
        keys, stacked["x_labeled"], stacked["y_labeled"],
        stacked["x_test"], stacked["y_test"], valid_dim=valid_dim, cfg=cfg,
    )
    return np.asarray(errs)
