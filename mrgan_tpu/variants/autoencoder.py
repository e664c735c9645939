"""Autoencoder-pretrained GAN (others/mr_gan_autoencoder.py).

A dense ReLU autoencoder (encoderNodes e.g. [1024, 512, 256], :110-125) is
trained with MSE/Adam for 100 epochs, batch 32, on the scaled features
(raw contact waveforms in the reference's modality-3 protocol, :57-58); the
train/test sets are then replaced by their encodings (:139-140) and the
standard feature-matching semi-supervised GAN runs on the encoded features.

Here both phases are fused scan programs, and AE pretraining + encoding +
GAN training for a whole fold stack execute under one vmap.
"""

import dataclasses
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..models import nets
from ..train import gan as gan_mod
from ..train import optim


@dataclasses.dataclass(frozen=True)
class AeConfig:
    nodes: tuple = (1024, 512, 256)  # encoderNodes, mr_gan_autoencoder.py:309
    epochs: int = 100                # :125
    batch_size: int = 32
    lr: float = 1e-3                 # keras Adam default


def ae_init(key, in_dim, nodes):
    dims = [in_dim, *nodes]
    enc_keys = jax.random.split(key, len(nodes) * 2 + 1)
    params = {"enc": [], "dec": []}
    for i in range(len(nodes)):
        params["enc"].append(nets.dense_init(enc_keys[i], dims[i], dims[i + 1]))
    # decoder: nodes[-2], reversed nodes[:-2], then linear back to in_dim
    dec_dims = [nodes[-1], *list(reversed(nodes[:-1])), in_dim]
    for i in range(len(dec_dims) - 1):
        params["dec"].append(
            nets.dense_init(enc_keys[len(nodes) + i], dec_dims[i],
                            dec_dims[i + 1])
        )
    return params


def encode(params, x):
    for p in params["enc"]:
        x = jax.nn.relu(nets.dense(p, x))
    return x


def decode(params, h):
    for p in params["dec"][:-1]:
        h = jax.nn.relu(nets.dense(p, h))
    return nets.dense(params["dec"][-1], h)  # linear output layer


def train_autoencoder(key, x_train, cfg: AeConfig):
    """MSE autoencoder training as a fused scan; returns trained params."""
    n, d = x_train.shape
    bs = min(cfg.batch_size, n)
    nb = max(n // bs, 1)
    k_init, k_run = jax.random.split(key)
    params = ae_init(k_init, d, tuple(cfg.nodes))
    opt = optim.init(params)

    def batch_step(carry, xb):
        params, opt = carry

        def loss_fn(p):
            return jnp.mean(jnp.square(decode(p, encode(p, xb)) - xb))

        grads = jax.grad(loss_fn)(params)
        params, opt = optim.update(grads, opt, params, lr=cfg.lr, b1=0.9)
        return (params, opt), None

    def epoch_body(carry, k_epoch):
        perm = jax.random.permutation(k_epoch, n)[: nb * bs]
        xb = x_train[perm].reshape(nb, bs, d)
        carry, _ = jax.lax.scan(batch_step, carry, xb)
        return carry, None

    (params, _), _ = jax.lax.scan(epoch_body, (params, opt),
                                  jax.random.split(k_run, cfg.epochs))
    return params


def _train_one(key, x_labeled, y_labeled, pool, x_test, y_test, *, n_train,
               ae_cfg: AeConfig, gan_cfg: gan_mod.GanConfig):
    """AE pretrain on the pool (the scaled train set), encode everything,
    then run the standard fused GAN trainer on encodings."""
    k_ae, k_gan = jax.random.split(key)
    ae = train_autoencoder(k_ae, pool, ae_cfg)
    err, aux = gan_mod._train_one(
        k_gan, encode(ae, x_labeled), y_labeled, encode(ae, pool),
        encode(ae, x_test), y_test,
        n_train=n_train, valid_dim=ae_cfg.nodes[-1], cfg=gan_cfg,
    )
    return err


@lru_cache(maxsize=16)
def _compiled(n_train, ae_cfg, gan_cfg):
    def one(key, xl, yl, pool, xt, yt):
        return _train_one(key, xl, yl, pool, xt, yt, n_train=n_train,
                          ae_cfg=ae_cfg, gan_cfg=gan_cfg)

    return jax.jit(jax.vmap(one))


def run_ae_gan_cell(x, y, percentlabeled, ae_cfg: AeConfig = AeConfig(),
                    gan_cfg: gan_mod.GanConfig = gan_mod.GanConfig(),
                    seed=0, n_splits=6):
    """Stratified cell with AE pretraining (mr_gan_autoencoder.py:296-313).
    Returns per-fold test ERRORS (the reference prints accuracies)."""
    from ..train import protocol

    rng = np.random.RandomState(seed)
    splits = protocol.stratified_splits(y, n_splits=n_splits, seed=seed)
    folds = [
        protocol.prepare_fold(x[tr], y[tr], x[te], y[te], percentlabeled,
                              None, gan_cfg.num_classes, rng)
        for tr, te in splits
    ]
    stacked = protocol.stack_folds(folds)
    from ..utils import rng as rng_util

    keys = rng_util.make_keys(rng.randint(2**31 - 1), len(folds))
    errs = _compiled(stacked["n_train"], ae_cfg, gan_cfg)(
        keys, stacked["x_labeled"], stacked["y_labeled"], stacked["pool"],
        stacked["x_test"], stacked["y_test"],
    )
    return np.asarray(errs)
