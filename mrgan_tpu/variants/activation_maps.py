"""Input-gradient class activation maps (others/mr_nn_activation_map.py).

The reference computes d(MSE(model(x), y_target))/dx with a Keras symbolic
gradient, L2-normalizes it (Keras ``normalize``: g / (sqrt(mean(g^2)) + 1e-5)),
takes |.| and min-max rescales to [0, 1] (mr_nn_activation_map.py:151-177).
In JAX this is three lines of jax.grad — computed here for a whole batch at
once (vmapped) rather than one sample per compiled function.
"""

import jax
import jax.numpy as jnp

from ..models import nets


def saliency(apply_fn, params, x, y_target):
    """|normalized d MSE(f(x), y)/dx|, min-max scaled per example.

    Args:
      apply_fn: params, (D,) -> (K,) model forward (eval mode).
      params: model parameters.
      x: (B, D) inputs.
      y_target: (B, K) regression/one-hot targets.
    Returns (B, D) activation maps in [0, 1].
    """

    def loss_one(xi, yi):
        return jnp.mean(jnp.square(apply_fn(params, xi) - yi))

    grads = jax.vmap(jax.grad(loss_one))(x, y_target)
    # keras.utils.normalize semantics: g / (sqrt(mean(g^2)) + 1e-5), per row
    norm = jnp.sqrt(jnp.mean(jnp.square(grads), axis=-1, keepdims=True))
    grads = grads / (norm + 1e-5)
    cam = jnp.abs(grads)
    lo = jnp.min(cam, axis=-1, keepdims=True)
    hi = jnp.max(cam, axis=-1, keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-12)


def mlp_saliency(params, x, y_target, widths=nets.MLP_WIDTHS):
    """Activation maps for the supervised MLP baseline (eval phase)."""

    def fwd(p, xi):
        return nets.mlp_apply(p, xi[None], train=False, widths=widths)[0]

    return saliency(fwd, params, x, y_target)
