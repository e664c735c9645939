"""Keras-2.0.9-semantics Adam.

The reference trains with ``Adam(lr=0.0006, beta_1=0.5)`` (mr_gan.py:165).
Keras 2.0.9 applies bias correction through the learning rate and adds eps
*outside* the sqrt of the raw second moment:

    lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
    p   -= lr_t * m / (sqrt(v) + eps)

which differs (negligibly, but we pin it anyway) from optax.adam's
mhat/(sqrt(vhat)+eps). Implemented as a ~20-line pytree transform so it is
trivially vmappable over fold/sweep axes.
"""

import jax
import jax.numpy as jnp


def init(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {
        "m": zeros,
        "v": jax.tree.map(jnp.zeros_like, params),
        "t": jnp.zeros((), jnp.int32),
    }


def update(grads, state, params, lr=6e-4, b1=0.5, b2=0.999, eps=1e-8):
    t = state["t"] + 1
    tf = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - jnp.power(b2, tf)) / (1.0 - jnp.power(b1, tf))
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1.0 - b1) * g, state["m"], grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1.0 - b2) * g * g, state["v"], grads)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + eps), params, m, v
    )
    return new_params, {"m": m, "v": v, "t": t}
