"""Network definitions as pure functions over parameter pytrees.

Architectures are pinned to the reference:
- generator (mr_gan.py:110-114):  z(100) -> Dense500 softplus -> BatchNorm
  (eps 2e-5, momentum 0.9) -> Dense500 softplus -> Dense(D)
- discriminator (mr_gan.py:117-128): GaussianNoise(0.3) -> D1000 relu ->
  GN(0.5) -> D500 relu -> GN(0.5) -> D250 relu -> GN(0.5) -> D250 relu ->
  GN(0.5) -> mid = D250 relu -> D(num_classes), mid tapped for the
  feature-matching loss (mr_gan.py:133).
- supervised MLP (mr_nn.py:101-113): same noisy trunk with an extra D250.

Initialization matches Keras 2.0.9 Dense defaults (glorot_uniform weights,
zero bias; BN gamma=1, beta=0). GaussianNoise is additive N(0, stddev) in
train mode only, threaded through explicit PRNG keys. BatchNorm uses batch
statistics in train mode; the reference's K.function updates never include
Keras's moving-average ops (mr_gan.py:169-171), and the generator is only ever
run in train phase, so no moving statistics are kept.

No flax/haiku dependency on the hot path: plain dict pytrees keep the train
step fully transparent to vmap/shard_map (the sweep axes of parallel/).
"""

import math

import jax
import jax.numpy as jnp

BN_EPS = 2e-5


def glorot_uniform(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def dense_init(key, in_dim, out_dim):
    return {
        "w": glorot_uniform(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def dense(p, x, precision=None):
    w = p["w"]
    if w.dtype == jnp.bfloat16 and x.dtype == jnp.float32:
        # bf16 "shadow" weights (train.optim.mm_shadow): on the MXU a
        # DEFAULT-precision f32 dot truncates operands to bf16 anyway, so
        # feeding a pre-truncated bf16 W is bitwise-identical (verified on
        # v5e) while streaming half the weight bytes from HBM. Accumulation
        # stays f32. The mixed path is only valid at DEFAULT precision: a
        # caller explicitly requesting HIGH/HIGHEST gets the f32 master
        # upcast instead (shadows carry no extra bits, so the upcast is
        # exact — it just restores the multi-pass precision semantics).
        if precision in (None, jax.lax.Precision.DEFAULT, "default"):
            dn = (((x.ndim - 1,), (0,)), ((), ()))
            return jax.lax.dot_general(
                x, w, dn, precision=precision,
                preferred_element_type=jnp.float32) + p["b"]
        w = w.astype(jnp.float32)
    return jnp.dot(x, w, precision=precision) + p["b"]


def gaussian_noise(key, x, stddev, train):
    if not train:
        return x
    return x + stddev * jax.random.normal(key, x.shape, x.dtype)


def batchnorm_init(dim):
    return {"gamma": jnp.ones((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


def batchnorm_train(p, x, axis_name=None):
    """Batch-stat normalization; ``axis_name`` extends the statistics across a
    data-parallel mesh axis (pmean over shards) so a DP-sharded batch is
    bit-equivalent to the single-device reference batch."""
    mean = jnp.mean(x, axis=0)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
    var = jnp.mean((x - mean) ** 2, axis=0)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (x - mean) * inv * p["gamma"] + p["beta"]


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------

def generator_init(key, noise_size, out_dim, hidden=500):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "d1": dense_init(k1, noise_size, hidden),
        "bn": batchnorm_init(hidden),
        "d2": dense_init(k2, hidden, hidden),
        "d3": dense_init(k3, hidden, out_dim),
    }


def generator_apply(params, z, out_mask=None, precision=None, axis_name=None):
    """Forward the generator (always train-phase, like the reference).

    ``out_mask``: optional (D,) 0/1 mask zeroing padded feature columns so a
    feature-dim-padded discriminator can't separate real/fake on pad values.
    ``axis_name``: data-parallel mesh axis for cross-shard BatchNorm stats.
    """
    x = jax.nn.softplus(dense(params["d1"], z, precision))
    x = batchnorm_train(params["bn"], x, axis_name=axis_name)
    x = jax.nn.softplus(dense(params["d2"], x, precision))
    x = dense(params["d3"], x, precision)
    if out_mask is not None:
        x = x * out_mask
    return x


# --------------------------------------------------------------------------
# Discriminator
# --------------------------------------------------------------------------

DISC_WIDTHS = (1000, 500, 250, 250)
NOISE_STDDEVS = (0.3, 0.5, 0.5, 0.5, 0.5)  # input + after each trunk layer


def discriminator_init(key, in_dim, num_classes, widths=DISC_WIDTHS, mid_width=250):
    keys = jax.random.split(key, len(widths) + 2)
    params = {}
    d = in_dim
    for i, w in enumerate(widths):
        params[f"d{i}"] = dense_init(keys[i], d, w)
        d = w
    params["mid"] = dense_init(keys[-2], d, mid_width)
    params["out"] = dense_init(keys[-1], mid_width, num_classes)
    return params


def discriminator_apply(params, x, key=None, train=False, in_mask=None,
                        precision=None, widths=DISC_WIDTHS,
                        noise_rows=None, noise_index=None):
    """Returns (logits, mid_features).

    ``in_mask``: optional (D,) 0/1 mask restricting input GaussianNoise to
    real feature columns (keeps padded columns exactly zero, preserving
    equivalence with the unpadded reference model).
    ``noise_rows``/``noise_index``: data-parallel exactness hook
    (parallel.spmd.train_gan_cell_dp) — when a DP shard holds rows
    ``noise_index`` of a global batch of ``noise_rows`` rows, every
    GaussianNoise tensor is drawn for the FULL global batch and sliced to
    the local rows, so the sharded step consumes bit-identical noise to the
    single-device step (same key -> same global tensor -> same rows).
    """
    n_noise = len(widths) + 1
    if train:
        keys = jax.random.split(key, n_noise)

        def draw(k, dim):
            if noise_index is None:
                return jax.random.normal(k, (x.shape[0], dim), x.dtype)
            full = jax.random.normal(k, (noise_rows, dim), x.dtype)
            return full[noise_index]

        noise = 0.3 * draw(keys[0], x.shape[-1])
        if in_mask is not None:
            noise = noise * in_mask
        x = x + noise
    for i, w in enumerate(widths):
        x = jax.nn.relu(dense(params[f"d{i}"], x, precision))
        if train:
            x = x + NOISE_STDDEVS[i + 1] * draw(keys[i + 1], w)
    mid = jax.nn.relu(dense(params["mid"], x, precision))
    logits = dense(params["out"], mid, precision)
    return logits, mid


# --------------------------------------------------------------------------
# Supervised MLP baseline (mr_nn.py:101-113)
# --------------------------------------------------------------------------

MLP_WIDTHS = (1000, 500, 250, 250, 250)


def mlp_init(key, in_dim, num_classes, widths=MLP_WIDTHS):
    keys = jax.random.split(key, len(widths) + 1)
    params = {}
    d = in_dim
    for i, w in enumerate(widths):
        params[f"d{i}"] = dense_init(keys[i], d, w)
        d = w
    params["out"] = dense_init(keys[-1], d, num_classes)
    return params


def mlp_apply(params, x, key=None, train=False, in_mask=None, precision=None,
              widths=MLP_WIDTHS):
    stddevs = (0.3,) + (0.5,) * (len(widths) - 1)
    if train:
        keys = jax.random.split(key, len(widths))
        noise = stddevs[0] * jax.random.normal(keys[0], x.shape, x.dtype)
        if in_mask is not None:
            noise = noise * in_mask
        x = x + noise
    for i, w in enumerate(widths):
        x = jax.nn.relu(dense(params[f"d{i}"], x, precision))
        if train and i + 1 < len(widths):
            x = gaussian_noise(keys[i + 1], x, stddevs[i + 1], True)
    return dense(params["out"], x, precision)
