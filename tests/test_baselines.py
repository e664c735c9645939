"""MLP / SVM baseline trainers on separable blobs + sklearn cross-checks."""

import numpy as np

from mrgan_tpu.train import mlp, svm


def _blobs(rng, n_per_class, dim, num_classes=6, sep=3.0):
    centers = rng.randn(num_classes, dim) * sep
    xs, ys = [], []
    for c in range(num_classes):
        xs.append(centers[c] + rng.randn(n_per_class, dim))
        ys.append(np.full(n_per_class, c, np.int32))
    return np.concatenate(xs).astype(np.float32), np.concatenate(ys)


def test_mlp_learns_blobs():
    rng = np.random.RandomState(0)
    x, y = _blobs(rng, 120, 20)
    cfg = mlp.MlpConfig(epochs=30, pad_multiple=8)
    errs = mlp.run_mlp_cell(x, y, percentlabeled=8, cfg=cfg, seed=1, n_splits=3)
    assert errs.shape == (3,)
    assert errs.mean() < 0.15, errs


def test_rbf_kernel_matches_sklearn():
    from sklearn.metrics.pairwise import rbf_kernel as sk_rbf

    rng = np.random.RandomState(1)
    a = rng.randn(40, 16).astype(np.float32)
    b = rng.randn(30, 16).astype(np.float32)
    got = np.asarray(svm.rbf_kernel(a, b, 0.1))
    want = sk_rbf(a, b, gamma=0.1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_svm_matches_direct_sklearn_svc():
    """Precomputed-kernel path must equal SVC(kernel='rbf', gamma='auto')."""
    from sklearn.svm import SVC

    rng = np.random.RandomState(2)
    x, y = _blobs(rng, 60, 12, sep=2.0)
    x_lab, y_lab = x[::2], y[::2]
    x_test, y_test = x[1::2], y[1::2]
    err = svm.fit_predict_error(x_lab, y_lab, x_test, y_test)

    direct = SVC(kernel="rbf", C=1.0, gamma=1.0 / 12)
    direct.fit(x_lab, y_lab)
    err_direct = 1.0 - direct.score(x_test, y_test)
    assert abs(err - err_direct) < 1e-6, (err, err_direct)


def test_svm_cell_protocol():
    rng = np.random.RandomState(3)
    x, y = _blobs(rng, 120, 12)
    errs = svm.run_svm_cell(x, y, percentlabeled=8, seed=4, n_splits=3)
    assert errs.shape == (3,)
    assert errs.mean() < 0.1, errs


def test_mlp_flat_small_carry_bitwise_identical():
    """MlpConfig.flat_small_carry is a pure carry relayout: fold errors must
    be bitwise identical to the default layout."""
    import dataclasses

    rng = np.random.RandomState(21)
    x = np.vstack([rng.randn(40, 24) + 2.5 * i for i in range(6)]).astype(
        np.float32)
    y = np.repeat(np.arange(6), 40).astype(np.int32)
    cfg = mlp.MlpConfig(epochs=4, pad_multiple=8)
    cfg_flat = dataclasses.replace(cfg, flat_small_carry=True)
    errs = mlp.run_mlp_cell(x, y, 100, cfg=cfg, seed=3, n_splits=2)
    errs_flat = mlp.run_mlp_cell(x, y, 100, cfg=cfg_flat, seed=3, n_splits=2)
    np.testing.assert_array_equal(np.asarray(errs), np.asarray(errs_flat))
