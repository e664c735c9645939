"""ctypes bindings for the native SMO solver (native/svm_smo.cpp).

The device computes the RBF Gram matrices (train/svm.py rbf_kernel); this
module solves the C-SVC dual on them without the libsvm dependency the
reference reaches through sklearn.svm.SVC (mr_svm.py:106). Multiclass is
one-vs-one with majority voting and (like libsvm) decision-sum
tie-breaking.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_NAME = "libsvmsmo.so"
_lock = threading.Lock()
_lib = None


def _lib_path():
    """Locate (or build on demand) the shared library, mirroring
    acquisition.serialdev.sim_path's resolution order."""
    env_bin = os.environ.get("MRGAN_NATIVE_BIN")
    if env_bin:
        path = os.path.join(env_bin, _LIB_NAME)
        if os.path.exists(path):
            return path
    path = os.path.join(_NATIVE_DIR, "bin", _LIB_NAME)
    if os.path.exists(path):
        return path
    src = os.path.join(_NATIVE_DIR, "svm_smo.cpp")
    if os.path.exists(src):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", path, src],
            check=True, cwd=_NATIVE_DIR)
        return path
    raise FileNotFoundError(
        f"{_LIB_NAME} not found: build it with `make -C native` from a "
        "source checkout, or point $MRGAN_NATIVE_BIN at prebuilt binaries")


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_lib_path())
            lib.svm_smo_train.restype = ctypes.c_int64
            lib.svm_smo_train.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # gram
                ctypes.POINTER(ctypes.c_int8),    # y (+1/-1)
                ctypes.c_int64,                   # n
                ctypes.c_double,                  # C
                ctypes.c_double,                  # tol
                ctypes.c_int64,                   # max_iter
                ctypes.POINTER(ctypes.c_double),  # alpha out
                ctypes.POINTER(ctypes.c_double),  # b out
            ]
            _lib = lib
    return _lib


def solve_binary(gram, y_pm, C=1.0, tol=1e-3, max_iter=0):
    """Solve one binary C-SVC dual on a precomputed kernel.

    gram: (n, n) float32 kernel matrix; y_pm: (n,) labels in {+1, -1}.
    Returns (alpha, b) with decision(x) = sum_i alpha_i y_i K(x_i, x) + b.
    """
    lib = _load()
    gram = np.ascontiguousarray(gram, np.float32)
    y_pm = np.ascontiguousarray(y_pm, np.int8)
    n = len(y_pm)
    assert gram.shape == (n, n)
    alpha = np.zeros(n, np.float64)
    b = ctypes.c_double(0.0)
    iters = lib.svm_smo_train(
        gram.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y_pm.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n, float(C), float(tol), int(max_iter),
        alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(b))
    if iters < 0:
        raise RuntimeError("SMO hit the iteration cap before converging")
    return alpha, float(b.value)


class OvoSVC:
    """One-vs-one multiclass C-SVC on precomputed kernels: the sklearn
    SVC(kernel='precomputed') surface the table protocols use, solved by
    the native SMO instead of libsvm."""

    def __init__(self, C=1.0, tol=1e-3):
        self.C = float(C)
        self.tol = float(tol)

    def fit(self, k_train, y):
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        self._pairs = []
        k_train = np.asarray(k_train, np.float32)
        for a in range(len(self.classes_)):
            for bq in range(a + 1, len(self.classes_)):
                ca, cb = self.classes_[a], self.classes_[bq]
                rows = np.flatnonzero((y == ca) | (y == cb))
                y_pm = np.where(y[rows] == ca, 1, -1).astype(np.int8)
                sub = np.ascontiguousarray(k_train[np.ix_(rows, rows)])
                alpha, b = solve_binary(sub, y_pm, self.C, self.tol)
                coef = alpha * y_pm  # alpha_i y_i, zero for non-SVs
                self._pairs.append((a, bq, rows, coef, b))
        return self

    def predict(self, k_test):
        """k_test: (m, n_train) kernel rows against the TRAINING set."""
        k_test = np.asarray(k_test, np.float64)
        m = len(k_test)
        votes = np.zeros((m, len(self.classes_)), np.int64)
        scores = np.zeros((m, len(self.classes_)), np.float64)
        for a, bq, rows, coef, b in self._pairs:
            dec = k_test[:, rows] @ coef + b
            win = np.where(dec > 0, a, bq)
            votes[np.arange(m), win] += 1
            scores[:, a] += dec
            scores[:, bq] -= dec
        # majority vote; break ties by the summed decision values
        best = votes + 1e-9 * np.tanh(scores)
        return self.classes_[np.argmax(best, axis=1)]

    def score(self, k_test, y_test):
        return float(np.mean(self.predict(k_test) == np.asarray(y_test)))
