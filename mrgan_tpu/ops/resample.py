"""Batched impact-window extraction and linear resampling.

TPU-native replacement for the offline preprocessing hot loop of
processdata.py:41-85: per poke, slice a window around ``impactTime`` out of an
irregularly-sampled sensor stream and lerp-resample it onto a fixed-size grid
(scipy.interpolate.interp1d semantics). Here the whole batch is one jittable
searchsorted + gather + lerp, so the 7200-poke x 14-config pipeline runs as a
handful of XLA kernels instead of ~400k scipy calls.

Variable-length source windows (the reference slices [pre:post] before
interpolating) are handled with static shapes: we keep the full padded stream
and clamp interpolation targets into [t[pre], t[post-1]], which reproduces the
reference exactly because the new grid is linspace(t[pre], t[post-1]) — always
inside the slice.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def interp1d_batch(x, y, x_new):
    """Linear interpolation, vmapped over a leading batch axis.

    Args:
      x:     (B, N) sorted sample times.
      y:     (B, N) sample values.
      x_new: (B, M) query times (must lie within [x[0], x[-1]] per row,
             matching scipy.interp1d's no-extrapolation contract).
    Returns (B, M) interpolated values.
    """
    return jax.vmap(jnp.interp)(x_new, x, y)


def _first_index_greater(t, thresh, valid):
    """np.argmax(t > thresh) over valid entries, as used at processdata.py:56.

    Rows are padded to static length; ``valid`` masks real samples.
    Returns 0 if no entry qualifies (numpy argmax semantics).
    """
    mask = (t > thresh) & valid
    any_hit = jnp.any(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1)
    return jnp.where(any_hit, idx, 0)


@partial(jax.jit, static_argnames=("num_out",))
def window_resample(t, v, valid, impact_time, pre, post, num_out):
    """Extract [impact-pre, impact+post] and resample to ``num_out`` points.

    Replicates processdata.py:56-77 for force/temperature streams:
      pre_idx  = argmax(t > impact - pre)
      post_idx = len(t) if t[-1] <= impact + post else argmax(t > impact + post)
      grid     = linspace(t[pre_idx], t[post_idx - 1], num_out)
      out      = interp1d(t[pre_idx:post_idx], v[pre_idx:post_idx])(grid)

    Args:
      t, v:        (B, N) padded times / values.
      valid:       (B, N) bool mask of real samples.
      impact_time: (B,) impact timestamps.
      pre, post:   scalars (seconds before / after impact).
      num_out:     static output grid size.
    """
    b, n = t.shape
    row = jnp.arange(b)
    n_valid = jnp.sum(valid, axis=-1)
    last = jnp.maximum(n_valid - 1, 0)
    t_last = t[row, last]

    pre_idx = _first_index_greater(t, (impact_time - pre)[:, None], valid)
    post_hit = _first_index_greater(t, (impact_time + post)[:, None], valid)
    post_idx = jnp.where(t_last <= impact_time + post, n_valid, post_hit)

    t_start = t[row, pre_idx]
    t_end = t[row, jnp.maximum(post_idx - 1, 0)]
    frac = jnp.linspace(0.0, 1.0, num_out)
    span = (t_end - t_start)[:, None]
    grid = t_start[:, None] + frac[None, :] * span

    # Interpolate in window-relative time (t - t_start): conditions the f32
    # lerp far better for high-rate streams where dt << t. Padded tail
    # times AND values are clamped to the last real sample: the times so
    # padding never brackets a query (grid <= t_end), the values because
    # jnp.interp's dx==0 branch otherwise returns the zero pad value when
    # the final grid point coincides with duplicated pad times (window
    # reaching the stream end on a row padded by >=2 entries).
    t_safe = jnp.where(valid, t, t_last[:, None]) - t_start[:, None]
    v_safe = jnp.where(valid, v, v[row, last][:, None])
    out = jax.vmap(jnp.interp)(frac[None, :] * span, t_safe, v_safe)
    return out, grid


@partial(jax.jit, static_argnames=("num_out",))
def window_resample_centered(t, v, valid, impact_time, half, num_out):
    """Contact-mic variant, processdata.py:79-83: window is impact +/- half,
    the grid starts at t[pre_idx + 1] (the reference's off-by-one), and the
    source slice is [pre_idx:post_idx]."""
    b, n = t.shape
    row = jnp.arange(b)
    n_valid = jnp.sum(valid, axis=-1)
    last = jnp.maximum(n_valid - 1, 0)
    t_last = t[row, last]

    pre_idx = _first_index_greater(t, (impact_time - half)[:, None], valid)
    post_idx = _first_index_greater(t, (impact_time + half)[:, None], valid)

    t_start = t[row, jnp.minimum(pre_idx + 1, n - 1)]
    t_end = t[row, jnp.maximum(post_idx - 1, 0)]
    frac = jnp.linspace(0.0, 1.0, num_out)
    span = (t_end - t_start)[:, None]
    grid = t_start[:, None] + frac[None, :] * span

    # Pad times AND values clamp to the last real sample (see
    # window_resample: the zero pad value would leak through interp's
    # dx==0 branch at the window's final grid point otherwise).
    t_safe = jnp.where(valid, t, t_last[:, None]) - t_start[:, None]
    v_safe = jnp.where(valid, v, v[row, last][:, None])
    out = jax.vmap(jnp.interp)(frac[None, :] * span, t_safe, v_safe)
    return out, grid


def first_deriv(x, t):
    """First time-derivative feature (mr_svm.py:15-20): forward differences
    with the last point repeating the final difference."""
    x = jnp.asarray(x)
    t = jnp.asarray(t)
    dx = jnp.diff(x, axis=-1) / jnp.diff(t, axis=-1)
    return jnp.concatenate([dx, dx[..., -1:]], axis=-1)


def make_padded(streams, times, dtype=np.float32):
    """Host-side helper: ragged python lists -> padded arrays + masks."""
    n = max(len(s) for s in streams)
    b = len(streams)
    v = np.zeros((b, n), dtype)
    t = np.zeros((b, n), np.float64)
    m = np.zeros((b, n), bool)
    for i, (s, tt) in enumerate(zip(streams, times)):
        k = len(s)
        v[i, :k] = s
        t[i, :k] = tt
        m[i, :k] = True
        if k < n:
            t[i, k:] = tt[-1]
    return t, v, m
