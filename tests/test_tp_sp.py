"""Tensor-parallel dense block and frame-sharded (sequence-parallel) mel
frontend — exactness vs their unsharded counterparts on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mrgan_tpu.ops import mel as mel_ops
from mrgan_tpu.parallel import tensor


def _model_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("model",))


def test_tp_block_matches_dense():
    rng = np.random.RandomState(0)
    d, h, k, b = 48, 64, 32, 10
    w1 = rng.randn(d, h).astype(np.float32)
    b1 = rng.randn(h).astype(np.float32)
    w2 = rng.randn(h, k).astype(np.float32)
    b2 = rng.randn(k).astype(np.float32)
    x = rng.randn(b, d).astype(np.float32)

    want = np.maximum(x @ w1 + b1, 0.0) @ w2 + b2

    mesh = _model_mesh(4)
    shards, b2_rep = tensor.shard_dense_pair(w1, b1, w2, b2, 4)
    apply_fn = tensor.make_tp_mlp_block(mesh)
    got = np.asarray(apply_fn(shards, jnp.asarray(b2_rep), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frame_sharded_logmel_matches_unsharded():
    rng = np.random.RandomState(1)
    # N chosen so T = 1 + N//512 is divisible by 8: T = 16 -> N = 15*512
    audio = (rng.randn(3, 15 * 512) * 50).astype(np.float32)
    want = np.asarray(mel_ops.logmel(audio, flatten=False))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    got = np.asarray(mel_ops.logmel_sharded(audio, mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)
