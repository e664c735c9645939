"""RBF-SVM baseline (mr_svm.py:77-116), TPU-native kernel computation.

The O(n^2 d) RBF Gram matrices — the expensive part — are computed on device
as a single matmul-based kernel (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b^T, MXU
path), vmapped over folds. The convex dual solve itself is tiny
(n_sv <= 6000); by default it runs in libsvm via SVC(kernel='precomputed'),
preserving the reference's exact solver semantics (C=1.0, gamma='auto' =
1/n_features, one-vs-one multiclass voting). SvmConfig(solver='native')
swaps in this framework's own C++ SMO solver (native/svm_smo.cpp via
train.native_svm), removing the libsvm dependency from the solve.
"""

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SvmConfig:
    C: float = 1.0           # mr_svm.py:106
    gamma: float | None = None  # None -> 'auto' = 1/n_features (2017 sklearn default)
    num_classes: int = 6
    # 'libsvm' preserves the reference's exact solver (sklearn SVC with a
    # precomputed kernel); 'native' uses this framework's own SMO solver
    # (native/svm_smo.cpp via train.native_svm) with no sklearn dependency
    # in the solve
    solver: str = "libsvm"


def _make_svc(cfg):
    if cfg.solver == "native":
        from . import native_svm

        return native_svm.OvoSVC(C=cfg.C)
    from sklearn.svm import SVC

    return SVC(kernel="precomputed", C=cfg.C)


@partial(jax.jit, static_argnames=())
def rbf_kernel(a, b, gamma):
    """exp(-gamma * ||a - b||^2) computed via the MXU-friendly expansion."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    d2 = a2 + b2.T - 2.0 * jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.exp(-gamma * jnp.maximum(d2, 0.0))


rbf_kernel_folds = jax.jit(jax.vmap(rbf_kernel, in_axes=(0, 0, None)))


def fit_predict_error(x_lab, y_lab, x_test, y_test, cfg: SvmConfig = SvmConfig()):
    """One fold: device Gram matrices + precomputed-kernel dual solve."""
    gamma = cfg.gamma if cfg.gamma is not None else 1.0 / x_lab.shape[-1]
    k_train = np.asarray(rbf_kernel(x_lab, x_lab, gamma))
    k_test = np.asarray(rbf_kernel(x_test, x_lab, gamma))
    svm = _make_svc(cfg)
    svm.fit(k_train, y_lab)
    return 1.0 - svm.score(k_test, y_test)


def run_svm_loo(objects, percentlabeled, cfg: SvmConfig = SvmConfig(), seed=0):
    """Leave-one-object-out SVM protocol (mr_svm.py:145-165): device Gram
    matrices per split (the O(n^2 d) part), libsvm dual solve on host."""
    from . import protocol

    rng = np.random.RandomState(seed)
    names = list(objects.keys())
    errors = []
    for name in names:
        fold = protocol.prepare_fold(*protocol._loo_split(objects, name),
                                     percentlabeled, None, cfg.num_classes,
                                     rng)
        errors.append(
            fit_predict_error(fold["x_labeled"], fold["y_labeled"],
                              fold["x_test"], fold["y_test"], cfg)
        )
    return names, np.asarray(errors)


def run_svm_cell(x, y, percentlabeled, cfg: SvmConfig = SvmConfig(), seed=0,
                 n_splits=6, splits=None):
    """mr_svm.py table cell; device Gram matrices batched across folds."""
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
    gamma = cfg.gamma if cfg.gamma is not None else 1.0 / stacked["x_labeled"].shape[-1]
    k_train = np.asarray(
        rbf_kernel_folds(stacked["x_labeled"], stacked["x_labeled"], gamma)
    )
    k_test = np.asarray(
        rbf_kernel_folds(stacked["x_test"], stacked["x_labeled"], gamma)
    )
    errors = []
    for f in range(len(folds)):
        svm = _make_svc(cfg)
        svm.fit(k_train[f], stacked["y_labeled"][f])
        errors.append(1.0 - svm.score(k_test[f], stacked["y_test"][f]))
    return np.asarray(errors)
