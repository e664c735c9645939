"""StandardScaler as pure on-device ops.

Replaces sklearn.preprocessing.StandardScaler at mr_gan.py:96-98: fit mean and
(population) variance on the train split, transform both splits. Zero-variance
columns pass through unscaled (sklearn semantics: scale_ of 0 variance -> 1).
"""

import jax
import jax.numpy as jnp


@jax.jit
def fit(x_train):
    """Return (mean, scale) fitted on x_train, sklearn StandardScaler semantics."""
    mean = jnp.mean(x_train, axis=0)
    var = jnp.mean((x_train - mean) ** 2, axis=0)
    scale = jnp.sqrt(var)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return mean, scale


@jax.jit
def transform(x, mean, scale):
    return (x - mean) / scale


@jax.jit
def fit_transform_pair(x_train, x_test):
    """Fit on train, transform train and test — the exact reference usage."""
    mean, scale = fit(x_train)
    return transform(x_train, mean, scale), transform(x_test, mean, scale)
