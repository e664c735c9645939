"""Variant baselines (others/wganlpctsemi.py:141-221 learnNNSVM):

- 'nn'   residual LeakyReLU/Dropout classifier, categorical cross-entropy,
         Adam, 200 epochs, batch 64 (:161-186);
- 'lstm' 3-layer biLSTM(16) over the feature vector as a scalar sequence,
         100 epochs, batch 128 (:187-203);
- 'svm'  5 kernel choices: SVC-rbf / SVC-linear / NuSVC-rbf / NuSVC-linear /
         LinearSVC (:204-214);
- 'rf'   RandomForest(n_estimators=10) (:215-221).

All return ACCURACY (not error), matching the variant's convention.
PCA + scale preprocessing (pcaScale, :135-148) is shared via ``pca_scale``.
"""

import dataclasses
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..models import variant_nets as vnets
from ..train import optim


def pca_scale(x_train, x_test, pca=0, scale=None):
    """pcaScale (wganlpctsemi.py:135-148): optional PCA, then Normalizer or
    StandardScaler."""
    if pca and pca > 0:
        from sklearn import decomposition

        p = decomposition.PCA(n_components=pca)
        x_train = p.fit_transform(x_train)
        x_test = p.transform(x_test)
    if scale is not None:
        from sklearn import preprocessing

        scaler = (preprocessing.Normalizer() if scale == "norm"
                  else preprocessing.StandardScaler())
        x_train = scaler.fit_transform(x_train)
        x_test = scaler.transform(x_test)
    return np.asarray(x_train, np.float32), np.asarray(x_test, np.float32)


def select_fraction_labeled(x_train, y_train, fraction, num_classes, rng):
    """Fraction-of-each-class labeled selection (wganlpctsemi.py:153-156)."""
    perm = rng.permutation(len(x_train))
    x_train, y_train = x_train[perm], y_train[perm]
    xs, ys = [], []
    for j in range(num_classes):
        n_j = int((y_train == j).sum() * fraction)
        xs.append(x_train[y_train == j][:n_j])
        ys.append(np.full(n_j, j, np.int32))
    return np.concatenate(xs), np.concatenate(ys)


# ---------------------------------------------------------------------------
# Residual NN (jitted scan trainer)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResNNConfig:
    epochs: int = 200        # wganlpctsemi.py:165
    batch_size: int = 64
    lr: float = 1e-3         # keras Adam default
    blocks: int = 3
    dropout: float = 0.2
    num_classes: int = 6


def _ce_loss(logits, y_onehot):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(y_onehot * logp, axis=-1))


def _resnn_train_one(key, x_lab, y_lab, x_test, y_test, cfg: ResNNConfig):
    n, d = x_lab.shape
    bs = min(cfg.batch_size, n)
    nb = max(n // bs, 1)
    y1h = jax.nn.one_hot(y_lab, cfg.num_classes)

    k_init, k_run = jax.random.split(key)
    params = vnets.res_classifier_init(k_init, d, cfg.num_classes, cfg.blocks)
    opt = optim.init(params)

    def batch_step(carry, inputs):
        params, opt = carry
        xb, yb, k = inputs

        def loss_fn(p):
            logits = vnets.res_classifier_apply(
                p, xb, k, train=True, blocks=cfg.blocks,
                dropout_rate=cfg.dropout)
            return _ce_loss(logits, yb)

        grads = jax.grad(loss_fn)(params)
        params, opt = optim.update(grads, opt, params, lr=cfg.lr, b1=0.9)
        return (params, opt), None

    def epoch_body(carry, k_epoch):
        k_perm, k_steps = jax.random.split(k_epoch)
        perm = jax.random.permutation(k_perm, n)[: nb * bs]
        xb = x_lab[perm].reshape(nb, bs, d)
        yb = y1h[perm].reshape(nb, bs, cfg.num_classes)
        carry, _ = jax.lax.scan(batch_step, carry,
                                (xb, yb, jax.random.split(k_steps, nb)))
        return carry, None

    (params, _), _ = jax.lax.scan(epoch_body, (params, opt),
                                  jax.random.split(k_run, cfg.epochs))
    logits = vnets.res_classifier_apply(params, x_test, train=False,
                                        blocks=cfg.blocks)
    return jnp.mean(jnp.argmax(logits, axis=1) == y_test)


@lru_cache(maxsize=32)
def _resnn_compiled(cfg):
    return jax.jit(lambda *a: _resnn_train_one(*a, cfg=cfg))


def learn_resnn(x_lab, y_lab, x_test, y_test, cfg: ResNNConfig = ResNNConfig(),
                seed=0):
    acc = _resnn_compiled(cfg)(
        jax.random.PRNGKey(seed),
        jnp.asarray(x_lab, jnp.float32), jnp.asarray(y_lab, jnp.int32),
        jnp.asarray(x_test, jnp.float32), jnp.asarray(y_test, jnp.int32),
    )
    return float(acc)


# ---------------------------------------------------------------------------
# biLSTM classifier
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BiLstmConfig:
    epochs: int = 100        # wganlpctsemi.py:192
    batch_size: int = 128
    lr: float = 1e-3
    units: int = 16
    layers: int = 3
    num_classes: int = 6


def _bilstm_train_one(key, x_lab, y_lab, x_test, y_test, cfg: BiLstmConfig):
    n, d = x_lab.shape
    bs = min(cfg.batch_size, n)
    nb = max(n // bs, 1)
    y1h = jax.nn.one_hot(y_lab, cfg.num_classes)

    k_init, k_run = jax.random.split(key)
    params = vnets.bilstm_classifier_init(k_init, cfg.num_classes, cfg.units,
                                          cfg.layers)
    opt = optim.init(params)

    def batch_step(carry, inputs):
        params, opt = carry
        xb, yb = inputs

        def loss_fn(p):
            logits = vnets.bilstm_classifier_apply(p, xb, cfg.layers)
            return _ce_loss(logits, yb)

        grads = jax.grad(loss_fn)(params)
        params, opt = optim.update(grads, opt, params, lr=cfg.lr, b1=0.9)
        return (params, opt), None

    def epoch_body(carry, k_epoch):
        perm = jax.random.permutation(k_epoch, n)[: nb * bs]
        xb = x_lab[perm].reshape(nb, bs, d)
        yb = y1h[perm].reshape(nb, bs, cfg.num_classes)
        carry, _ = jax.lax.scan(batch_step, carry, (xb, yb))
        return carry, None

    (params, _), _ = jax.lax.scan(epoch_body, (params, opt),
                                  jax.random.split(k_run, cfg.epochs))
    logits = vnets.bilstm_classifier_apply(params, x_test, cfg.layers)
    return jnp.mean(jnp.argmax(logits, axis=1) == y_test)


@lru_cache(maxsize=32)
def _bilstm_compiled(cfg):
    return jax.jit(lambda *a: _bilstm_train_one(*a, cfg=cfg))


def learn_bilstm(x_lab, y_lab, x_test, y_test,
                 cfg: BiLstmConfig = BiLstmConfig(), seed=0):
    acc = _bilstm_compiled(cfg)(
        jax.random.PRNGKey(seed),
        jnp.asarray(x_lab, jnp.float32), jnp.asarray(y_lab, jnp.int32),
        jnp.asarray(x_test, jnp.float32), jnp.asarray(y_test, jnp.int32),
    )
    return float(acc)


# ---------------------------------------------------------------------------
# SVM kernel zoo and random forest (host sklearn; the expensive Gram products
# for the rbf/linear kernels come from the device via train.svm.rbf_kernel)
# ---------------------------------------------------------------------------

def learn_svm(x_lab, y_lab, x_test, y_test, kernel=0):
    from sklearn.svm import SVC, LinearSVC, NuSVC

    models = {
        0: lambda: SVC(kernel="rbf"),
        1: lambda: SVC(kernel="linear"),
        2: lambda: NuSVC(kernel="rbf"),
        3: lambda: NuSVC(kernel="linear"),
        4: lambda: LinearSVC(),
    }
    svm = models[kernel]()
    svm.fit(x_lab, y_lab)
    return float(svm.score(x_test, y_test))


def learn_rf(x_lab, y_lab, x_test, y_test, n_estimators=10, seed=0):
    from sklearn import ensemble

    model = ensemble.RandomForestClassifier(n_estimators=n_estimators,
                                            random_state=seed)
    model.fit(x_lab, y_lab)
    return float(model.score(x_test, y_test))
