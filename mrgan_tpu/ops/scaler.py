"""StandardScaler as pure on-device ops — the ONE canonical implementation.

Replaces sklearn.preprocessing.StandardScaler at mr_gan.py:96-98: fit mean and
(population) variance on the train split, transform both splits. Constant
columns pass through unscaled (sklearn semantics: scale_ of 0 variance -> 1).

NEAR-constant columns (std below ~10 eps relative to the column's magnitude —
e.g. mel bins pinned at the top_db floor) also pass through, like modern
sklearn's ``_handle_zeros_in_scale``: dividing by an f32 cancellation-noise
std amplifies junk by ~1e6 and was observed to diverge a high-label MLP fold
(exact-chance collapse) on wide synthetic audio features. Genuine feature
columns sit orders of magnitude above the threshold, so real scaling is
untouched.

``train.gan.scale_stats`` (device sweep path) and
``train.protocol.scale_fold`` (host numpy path) both delegate here so the
guard can never drift between paths again.
"""

import jax
import jax.numpy as jnp
import numpy as np

# Column std at or below NEAR_CONSTANT_RTOL * max(1, |mean|) is treated as
# constant (f32 cancellation noise, ~10 eps).
NEAR_CONSTANT_RTOL = 1.2e-6


@jax.jit
def fit(x_train):
    """Return (mean, scale) fitted on x_train; sklearn StandardScaler
    semantics with the near-constant pass-through guard."""
    mean = jnp.mean(x_train, axis=0)
    var = jnp.mean(jnp.square(x_train - mean), axis=0)
    std = jnp.sqrt(var)
    tiny = std <= NEAR_CONSTANT_RTOL * jnp.maximum(1.0, jnp.abs(mean))
    return mean, jnp.where(tiny, 1.0, std)


@jax.jit
def transform(x, mean, scale):
    return (x - mean) / scale


@jax.jit
def fit_transform_pair(x_train, x_test):
    """Fit on train, transform train and test — the exact reference usage."""
    mean, scale = fit(x_train)
    return transform(x_train, mean, scale), transform(x_test, mean, scale)


def fit_numpy(x_train):
    """Host-side (numpy) twin of :func:`fit` for pre-device fold prep."""
    mean = x_train.mean(axis=0)
    std = x_train.std(axis=0)
    std[std <= NEAR_CONSTANT_RTOL * np.maximum(1.0, np.abs(mean))] = 1.0
    return mean, std
