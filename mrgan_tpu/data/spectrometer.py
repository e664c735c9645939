"""SCiO/Lumini spectrometer dataset utilities (others/util.py).

The WGAN-LP-CT grid search also runs on a handheld-spectrometer dataset; the
reference's loader parses per-measurement text files (material/object
directory layout, original + sensitivity-corrected spectra split by a
'sensitivity' marker line) and caps samples per object. Reproduced here with
the same schema; ``first_deriv`` reuses the vectorized resampler kernel
(ops.resample.first_deriv) instead of the reference's per-row python loop
(util.py:56-64).
"""

import glob
import os

import numpy as np

from ..ops import resample


def load_lumini_dataset(data_dir=os.path.join("data", "lumini")):
    """util.py:4-26: returns (rows, wavelengths) where each row is
    [material, object, exposure, *orig_values, *corrected_values]."""
    data = []
    wavelengths = None
    filenames = sorted(glob.glob(os.path.join(data_dir, "*", "*", "*_*_*.txt")))
    for filename in filenames:
        parts = filename.split(os.sep)
        material, object_name = parts[-3], parts[-2]
        exposure = int(parts[-1].split(".")[0].split("_")[-1])
        with open(filename) as f:
            lines = f.read().splitlines()
        split = next(
            (i for i, l in enumerate(lines) if "sensitivity" in l), 0
        )
        orig = np.array([l.split("\t") for l in lines[1:split]], np.float64)
        corrected = np.array([l.split("\t") for l in lines[split + 1 :]],
                             np.float64)
        if wavelengths is None:
            wavelengths = orig[:, 0]
        elif not (np.array_equal(wavelengths, orig[:, 0])
                  and np.array_equal(wavelengths, corrected[:, 0])):
            raise ValueError(
                f"Found a file with inconsistent wavelengths: {filename}"
            )
        data.append([material, object_name, exposure]
                    + orig[:, 1].tolist() + corrected[:, 1].tolist())
    return data, wavelengths


def process_lumini_dataset(data, material_names, object_names,
                           sample_count=20, exposure=100,
                           corrected_values=True):
    """util.py:28-54: filter by material/object/exposure, cap per-object
    samples, choose corrected or original spectra. Returns (X, y) lists."""
    X, y = [], []
    counts = {}
    for d in data:
        material, obj, exp = d[0], d[1], d[2]
        if material not in material_names or exp != exposure:
            continue
        index = material_names.index(material)
        if obj not in object_names[index]:
            continue
        values = d[3:]
        half = len(values) // 2
        values = values[:half] if corrected_values else values[half:]
        key = material + obj
        if counts.get(key, 0) < sample_count:
            X.append(values)
            y.append(index)
            counts[key] = counts.get(key, 0) + 1
    return X, y


def first_deriv(x, wavelengths):
    """First derivative w.r.t. wavelength (util.py:56-64), vectorized on
    device for the whole batch."""
    x = np.atleast_2d(np.asarray(x, np.float32))
    w = np.broadcast_to(np.asarray(wavelengths, np.float32), x.shape)
    return np.asarray(resample.first_deriv(x, w))


def preprocess_spectra(X, y, wavelengths, uvir=None, deriv_log=None,
                       double_data=False):
    """wganlpctsemi.py:89-133 ``preprocess``: optional UV/IR band selection,
    then repeated log / first-derivative / (log+deriv+demean) transforms."""
    X = np.copy(np.asarray(X, np.float64))
    y = np.copy(np.asarray(y))
    wavelengths = np.copy(np.asarray(wavelengths, np.float64))

    if uvir == "uv":
        keep = wavelengths < 400
        X, wavelengths = X[:, keep], wavelengths[keep]
    elif uvir == "ir":
        keep = wavelengths > 700
        X, wavelengths = X[:, keep], wavelengths[keep]

    if deriv_log is None:
        return X, y, wavelengths

    def _deriv(x):
        if not double_data:
            return first_deriv(x, wavelengths)
        half = len(wavelengths)
        return np.concatenate(
            [first_deriv(x[:, :half], wavelengths),
             first_deriv(x[:, half:], wavelengths)], axis=-1)

    n = int(deriv_log[-1])
    if "log" in deriv_log:
        for _ in range(n):
            X = np.ma.log(X).filled(0)
    elif "preprocess" in deriv_log:
        for _ in range(n):
            X = np.ma.log(X).filled(0)
            X = _deriv(X)
            X -= np.mean(X, axis=-1, keepdims=True)
    elif "deriv" in deriv_log:
        for _ in range(n):
            X = _deriv(X)
    return X, y, wavelengths
