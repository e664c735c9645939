"""Networks for the WGAN-LP-CT variant family (others/wganlpctsemi.py).

- small softplus generator (wganlpctsemi.py:246-250): z -> 64 sp -> 64 sp -> D
  (iwganlstm uses width 16, :300-304);
- residual LeakyReLU/Dropout discriminator (wganlpctsemi.py:276-295):
  Dense128 -> 4x [LeakyReLU -> Dropout(0.4) -> Dense128 -> Add] ->
  LeakyReLU (mid tap) -> Dropout -> Dense(K);
- residual supervised classifier (wganlpctsemi.py:166-186): width-D blocks,
  Dropout 0.2, softmax head trained with categorical cross-entropy;
- Keras-2.0.9-semantics (bi)LSTM: tanh activation, hard_sigmoid recurrent
  activation, unit forget bias, glorot/orthogonal init — as a lax.scan.

Dropout is Keras-style inverted dropout, active only in train mode, threaded
through explicit PRNG keys. LeakyReLU alpha pinned to the Keras 2.0.9
default 0.3.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .nets import dense, dense_init, glorot_uniform

LEAKY_ALPHA = 0.3  # keras 2.0.9 LeakyReLU default


def leaky_relu(x):
    return jnp.where(x >= 0, x, LEAKY_ALPHA * x)


def dropout(key, x, rate, train):
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# Small generator (wganlpctsemi.py:246-250)
# ---------------------------------------------------------------------------

def small_generator_init(key, noise_size, out_dim, hidden=64):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "d1": dense_init(k1, noise_size, hidden),
        "d2": dense_init(k2, hidden, hidden),
        "d3": dense_init(k3, hidden, out_dim),
    }


def small_generator_apply(params, z):
    x = jax.nn.softplus(dense(params["d1"], z))
    x = jax.nn.softplus(dense(params["d2"], x))
    return dense(params["d3"], x)


# ---------------------------------------------------------------------------
# Residual discriminator (wganlpctsemi.py:276-295)
# ---------------------------------------------------------------------------

def res_disc_init(key, in_dim, num_classes, width=128, blocks=4,
                  dropout_rate=0.4):
    keys = jax.random.split(key, blocks + 2)
    params = {"in": dense_init(keys[0], in_dim, width)}
    for i in range(blocks):
        params[f"b{i}"] = dense_init(keys[i + 1], width, width)
    params["out"] = dense_init(keys[-1], width, num_classes)
    return params


def res_disc_apply(params, x, key=None, train=False, blocks=4,
                   dropout_rate=0.4):
    """Returns (logits, mid). Mirrors the reference block structure:
    x1 = LeakyReLU(in(x)); repeat: x = Dense(Drop(x1)); x1 = LeakyReLU(x1+x);
    mid = final x1."""
    if train:
        keys = jax.random.split(key, blocks + 1)
    x1 = leaky_relu(dense(params["in"], x))
    for i in range(blocks):
        h = dropout(keys[i], x1, dropout_rate, True) if train else x1
        h = dense(params[f"b{i}"], h)
        x1 = leaky_relu(x1 + h)
    mid = x1
    h = dropout(keys[-1], mid, dropout_rate, True) if train else mid
    logits = dense(params["out"], h)
    return logits, mid


# ---------------------------------------------------------------------------
# Residual supervised classifier (wganlpctsemi.py:166-186)
# ---------------------------------------------------------------------------

def res_classifier_init(key, in_dim, num_classes, blocks=3):
    keys = jax.random.split(key, blocks + 1)
    params = {}
    for i in range(blocks):
        params[f"b{i}"] = dense_init(keys[i], in_dim, in_dim)
    params["out"] = dense_init(keys[-1], in_dim, num_classes)
    return params


def res_classifier_apply(params, x, key=None, train=False, blocks=3,
                         dropout_rate=0.2):
    """Block i feeds Dense(dropout(x1)) back into x1 via Add + LeakyReLU
    (no dropout before block 0); a final dropout precedes the softmax head."""
    if train:
        keys = jax.random.split(key, blocks)
    x1 = x
    for i in range(blocks):
        h = (dropout(keys[i - 1], x1, dropout_rate, True)
             if train and i > 0 else x1)
        h = dense(params[f"b{i}"], h)
        x1 = leaky_relu(x1 + h)
    h = dropout(keys[-1], x1, dropout_rate, True) if train else x1
    return dense(params["out"], h)


# ---------------------------------------------------------------------------
# Keras-semantics LSTM (wganlpctsemi.py:187-203, 306-318)
# ---------------------------------------------------------------------------

def _orthogonal(key, shape):
    """Orthogonal init for possibly non-square matrices (Keras semantics):
    QR of the taller orientation, sign-fixed, transposed back if needed."""
    n_rows, n_cols = shape
    a = jax.random.normal(key, (max(shape), min(shape)))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    return q if n_rows >= n_cols else q.T


def lstm_init(key, in_dim, units):
    k1, k2 = jax.random.split(key)
    wx = glorot_uniform(k1, (in_dim, 4 * units))
    wh = _orthogonal(k2, (units, 4 * units))
    b = np.zeros(4 * units, np.float32)
    b[units : 2 * units] = 1.0  # unit forget bias (keras default)
    return {"wx": wx, "wh": jnp.asarray(wh, jnp.float32),
            "b": jnp.asarray(b)}


def hard_sigmoid(x):
    """Keras 2.0.9 recurrent activation: clip(0.2x + 0.5, 0, 1)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def lstm_apply(params, xs, reverse=False, return_sequences=True):
    """xs: (B, T, F) -> (B, T, U) or (B, U). Gate order i, f, c, o (Keras)."""
    units = params["wh"].shape[0]
    b = params["b"]

    def step(carry, x_t):
        h, c = carry
        z = x_t @ params["wx"] + h @ params["wh"] + b
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = hard_sigmoid(i), hard_sigmoid(f), hard_sigmoid(o)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c), h

    bsz = xs.shape[0]
    h0 = jnp.zeros((bsz, units), xs.dtype)
    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, F)
    (h, _), hs = jax.lax.scan(step, (h0, h0), xs_t, reverse=reverse)
    if return_sequences:
        return jnp.swapaxes(hs, 0, 1)
    # with reverse=True, scan's per-step outputs are still time-ordered, and
    # the final carry is the step at t=0 — which is Keras's Backward output
    return h


def bilstm_init(key, in_dim, units):
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_init(kf, in_dim, units),
            "bwd": lstm_init(kb, in_dim, units)}


def bilstm_apply(params, xs, return_sequences=True):
    # lax.scan(reverse=True) already returns TIME-ALIGNED per-step outputs
    # (hb[:, t] = backward state having consumed T-1..t), which is exactly
    # what Keras Bidirectional produces after it un-reverses the
    # go_backwards output — so no flip here.
    hf = lstm_apply(params["fwd"], xs, False, return_sequences)
    hb = lstm_apply(params["bwd"], xs, True, return_sequences)
    return jnp.concatenate([hf, hb], axis=-1)


def bilstm_classifier_init(key, num_classes, units=16, layers=3):
    keys = jax.random.split(key, layers + 1)
    params = {"l0": bilstm_init(keys[0], 1, units)}
    for i in range(1, layers):
        params[f"l{i}"] = bilstm_init(keys[i], 2 * units, units)
    params["out"] = dense_init(keys[-1], 2 * units, num_classes)
    return params


def bilstm_classifier_apply(params, x, layers=3):
    """x: (B, D) treated as a length-D sequence of scalars
    (wganlpctsemi.py:193-196). Returns logits."""
    h = x[..., None]
    for i in range(layers):
        h = bilstm_apply(params[f"l{i}"], h,
                         return_sequences=(i + 1 < layers))
    return dense(params["out"], h)
