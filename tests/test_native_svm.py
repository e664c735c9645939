"""Native SMO solver (native/svm_smo.cpp) vs the libsvm reference solve.

The table protocols' SVM baseline (mr_svm.py:106 semantics) computes RBF
Gram matrices on device and solves the C-SVC dual on host; these tests pin
the native solver to sklearn/libsvm on the same precomputed kernels."""

import numpy as np
import pytest

from mrgan_tpu.train import native_svm, svm


def _blobs(rng, n_per, centers, spread):
    xs, ys = [], []
    for c, mu in enumerate(centers):
        xs.append(mu + spread * rng.randn(n_per, len(mu)))
        ys += [c] * n_per
    return np.concatenate(xs).astype(np.float32), np.asarray(ys)


def _grams(x_train, x_test, gamma):
    k_train = np.asarray(svm.rbf_kernel(x_train, x_train, gamma))
    k_test = np.asarray(svm.rbf_kernel(x_test, x_train, gamma))
    return k_train, k_test


def test_binary_matches_libsvm():
    """Binary solve: dual feasibility, KKT convergence, and decision parity
    with sklearn's libsvm on overlapping (non-separable) blobs."""
    from sklearn.svm import SVC

    rng = np.random.RandomState(0)
    x, y = _blobs(rng, 80, [np.zeros(8), 0.8 * np.ones(8)], 1.0)
    xt, yt = _blobs(rng, 40, [np.zeros(8), 0.8 * np.ones(8)], 1.0)
    gamma = 1.0 / 8
    k_train, k_test = _grams(x, xt, gamma)
    y_pm = np.where(y == 0, 1, -1).astype(np.int8)

    alpha, b = native_svm.solve_binary(k_train, y_pm, C=1.0)
    # dual feasibility
    assert np.all(alpha >= -1e-12) and np.all(alpha <= 1.0 + 1e-12)
    assert abs(np.dot(alpha, y_pm)) < 1e-9
    # the dual objective must match libsvm's optimum (same convex program)
    ref = SVC(kernel="precomputed", C=1.0).fit(k_train, y)

    def dual_obj(a):
        qa = (a * y_pm) @ k_train * y_pm
        return 0.5 * np.dot(a, qa) - a.sum()

    a_ref = np.zeros(len(y))
    # sklearn's dual_coef_ is alpha_i * y_i over support rows, with class
    # ordering classes_[1] positive — recover |alpha|
    a_ref[ref.support_] = np.abs(ref.dual_coef_[0])
    assert dual_obj(alpha) <= dual_obj(a_ref) + 1e-3 * (1 + abs(dual_obj(a_ref)))

    dec = k_test @ (alpha * y_pm) + b
    pred = np.where(dec > 0, 0, 1)
    ref_pred = ref.predict(k_test)
    assert np.mean(pred == ref_pred) >= 0.99


@pytest.mark.parametrize("spread", [0.6, 1.4])
def test_multiclass_matches_libsvm(spread):
    """Six-class one-vs-one voting parity on the table protocol surface."""
    from sklearn.svm import SVC

    rng = np.random.RandomState(1)
    centers = [2.0 * rng.randn(10) for _ in range(6)]
    x, y = _blobs(rng, 40, centers, spread)
    xt, yt = _blobs(rng, 20, centers, spread)
    gamma = 1.0 / 10
    k_train, k_test = _grams(x, xt, gamma)

    ours = native_svm.OvoSVC(C=1.0).fit(k_train, y)
    ref = SVC(kernel="precomputed", C=1.0).fit(k_train, y)
    acc_ours = ours.score(k_test, yt)
    acc_ref = ref.score(k_test, yt)
    assert np.mean(ours.predict(k_test) == ref.predict(k_test)) >= 0.97
    assert abs(acc_ours - acc_ref) <= 0.02


def test_run_svm_cell_native_solver():
    """The table-cell protocol with solver='native' tracks the libsvm run."""
    rng = np.random.RandomState(2)
    centers = [1.5 * rng.randn(12) for _ in range(6)]
    x, y = _blobs(rng, 60, centers, 1.0)
    perm = rng.permutation(len(y))
    x, y = x[perm], y[perm]
    errs_native = svm.run_svm_cell(
        x, y, 100, cfg=svm.SvmConfig(solver="native"), seed=0, n_splits=3)
    errs_libsvm = svm.run_svm_cell(
        x, y, 100, cfg=svm.SvmConfig(), seed=0, n_splits=3)
    np.testing.assert_allclose(errs_native, errs_libsvm, atol=0.03)
