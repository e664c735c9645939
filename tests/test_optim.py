"""Keras-2.0.9 Adam semantics (train/optim.py) against hand-computed values:
lr_t = lr*sqrt(1-b2^t)/(1-b1^t); p -= lr_t * m/(sqrt(v)+eps) — eps OUTSIDE
the bias-corrected sqrt, unlike optax.adam."""

import jax
import numpy as np
import jax.numpy as jnp

from mrgan_tpu.train import optim


def test_adam_first_step_hand_computed():
    p = {"w": jnp.array([1.0, -2.0])}
    g = {"w": jnp.array([0.5, -1.0])}
    lr, b1, b2, eps = 6e-4, 0.5, 0.999, 1e-8
    state = optim.init(p)
    new_p, state = optim.update(g, state, p, lr=lr, b1=b1, b2=b2, eps=eps)

    m = (1 - b1) * np.array([0.5, -1.0])
    v = (1 - b2) * np.array([0.25, 1.0])
    lr_t = lr * np.sqrt(1 - b2) / (1 - b1)
    want = np.array([1.0, -2.0]) - lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(np.asarray(new_p["w"]), want, rtol=1e-6)
    assert int(state["t"]) == 1


def test_adam_two_steps_bias_correction():
    p = {"w": jnp.array([0.0])}
    state = optim.init(p)
    lr, b1, b2, eps = 1e-3, 0.9, 0.999, 1e-8
    g = {"w": jnp.array([1.0])}
    m = v = 0.0
    w = 0.0
    for t in (1, 2):
        p, state = optim.update(g, state, p, lr=lr, b1=b1, b2=b2, eps=eps)
        m = b1 * m + (1 - b1) * 1.0
        v = b2 * v + (1 - b2) * 1.0
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        w = w - lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(float(p["w"][0]), w, rtol=1e-4)  # f32


def test_bf16_shadow_bitwise_exact_on_tpu():
    """HARDWARE-GATED (VERDICT r1 #9): on a TPU backend, dense() through the
    bf16 shadow must be bitwise identical to the DEFAULT-precision f32 dot
    (the MXU truncates f32 operands to bf16 per pass either way). The repo
    suite pins CPU via conftest, so here this skips; it runs wherever pytest
    runs on a chip, and tools/check_shadow_exactness.py is the standalone
    hardware check used by the verification flow."""
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("TPU-only invariant (CPU computes f32 dots exactly)")
    import sys

    sys.path.insert(0, ".")
    from tools import check_shadow_exactness as chk

    for m, k, n in [(150, 1280, 1000), (50, 100, 500)]:
        bits_equal, maxdiff = chk.check(m, k, n, seed=m)
        assert bits_equal, f"{m}x{k}x{n}: max diff {maxdiff}"


def test_carry_pack_roundtrip():
    """CarryPack: pack/unpack is the identity relayout, matrices keep their
    own buffers, sub-matrix leaves group into one flat vec per dtype."""
    import jax.numpy as jnp

    from mrgan_tpu.train import optim

    tree = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": jnp.asarray([1.0, 2.0], jnp.float32),
        "m": jnp.asarray([3.0, 4.0, 5.0], jnp.bfloat16),
        "t": jnp.asarray(7, jnp.int32),
        "nest": {"gamma": jnp.asarray([8.0], jnp.float32)},
    }
    packer = optim.CarryPack(tree)
    packed = packer.pack(tree)
    # kept: w; groups: bfloat16 (m), float32 (b, gamma), int32 (t)
    assert len(packed) == 4
    assert packed[0].shape == (3, 4)
    dtypes = sorted(str(a.dtype) for a in packed[1:])
    assert dtypes == ["bfloat16", "float32", "int32"]
    out = packer.unpack(packed)
    for k in tree:
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(out[k])[0]),
            np.asarray(jax.tree.leaves(tree[k])[0]))
    # exact roundtrip for every leaf, including nested
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)) and a.dtype == b.dtype
        and a.shape == b.shape, tree, out))


def test_carry_pack_under_vmap():
    """pack/unpack trace correctly under vmap (the fold axis)."""
    import jax.numpy as jnp

    from mrgan_tpu.train import optim

    tree = {"w": jnp.ones((2, 3, 4)), "b": jnp.zeros((2, 3)),
            "t": jnp.zeros((2,), jnp.int32)}
    per_fold = jax.tree.map(lambda a: a[0], tree)
    packer = optim.CarryPack(per_fold)

    def roundtrip(t):
        return packer.unpack(packer.pack(t))

    out = jax.vmap(roundtrip)(tree)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), tree, out))
