"""End-to-end GAN training smoke/learning tests on tiny synthetic blobs."""

import dataclasses

import numpy as np
import jax

from mrgan_tpu.train import gan, protocol, schedule
from mrgan_tpu.models import losses
import jax.numpy as jnp


def _blobs(rng, n_per_class, dim, num_classes=6, sep=3.0):
    centers = rng.randn(num_classes, dim) * sep
    xs, ys = [], []
    for c in range(num_classes):
        xs.append(centers[c] + rng.randn(n_per_class, dim))
        ys.append(np.full(n_per_class, c, np.int32))
    return np.concatenate(xs).astype(np.float32), np.concatenate(ys)


def test_losses_hand_computed():
    logits = jnp.array([[1.0, 2.0, 0.0], [0.5, 0.5, 3.0]])
    labels = jnp.array([1, 2])
    lse = np.log(np.exp([1.0, 2.0, 0.0]).sum()), np.log(np.exp([0.5, 0.5, 3.0]).sum())
    want = -np.mean([2.0, 3.0]) + np.mean(lse)
    got = losses.loss_labeled(logits, labels)
    np.testing.assert_allclose(got, want, rtol=1e-4)

    lu = losses.loss_unlabeled(logits, logits)
    sp = np.log1p(np.exp(lse))
    want_unl = -0.5 * np.mean(lse) + 0.5 * np.mean(sp) + 0.5 * np.mean(sp)
    np.testing.assert_allclose(lu, want_unl, rtol=1e-4)

    mid_fake = jnp.array([[1.0, 0.0], [3.0, 2.0]])
    mid_real = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    # means: fake (2,1), real (1,2) -> diff (1,-1) -> mean square = 1
    np.testing.assert_allclose(
        losses.loss_feature_matching(mid_fake, mid_real), 1.0, rtol=1e-6
    )


def test_lipschitz_penalty_semantics():
    # petzka=False pins the reference's normalize-then-hinge form, which is
    # identically zero (every component of a unit vector is <= 1).
    x_real = jnp.ones((2, 4))
    x_fake = jnp.zeros((2, 4))
    eps = jnp.full((2, 1), 0.5)
    disc = lambda m: 3.0 * jnp.sum(m, axis=1)
    got = losses.lipschitz_penalty(disc, x_real, x_fake, eps)
    np.testing.assert_allclose(np.asarray(got), 0.0)

    # petzka=True: the published norm-hinged penalty. grad of
    # mean(3*sum(m, axis=1)) over B=2 rows is 3/2 per element; per-row
    # norm = 1.5*sqrt(4) = 3 -> penalty = (3-1)^2 = 4.
    got_p = losses.lipschitz_penalty(disc, x_real, x_fake, eps, petzka=True)
    np.testing.assert_allclose(np.asarray(got_p), 4.0, rtol=1e-6)


def test_consistency_term_margin():
    logits1 = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    logits2 = jnp.array([[0.0, 2.0], [2.0, 0.0]])
    mid = jnp.zeros((2, 3))
    key = jax.random.PRNGKey(0)
    # stddev=0 makes the passes deterministic: per-row ct =
    # ||softmax(l1)-softmax(l2)||_2 = sqrt(2)*|p-q| with p,q the two
    # softmax probs; mids identical contribute 0.
    p = 1.0 / (1.0 + np.exp(-2.0))
    ct_row = np.sqrt(2.0) * abs(2 * p - 1.0)
    got = losses.consistency_term(logits1, logits2, mid, mid, key, stddev=0.0)
    np.testing.assert_allclose(np.asarray(got), ct_row, rtol=1e-5)
    # the margin subtracts before the hinge (published CT-GAN M')
    got_m = losses.consistency_term(logits1, logits2, mid, mid, key,
                                    stddev=0.0, margin=ct_row + 1.0)
    np.testing.assert_allclose(np.asarray(got_m), 0.0)


def test_tiled_permutation_reference_semantics():
    key = jax.random.PRNGKey(0)
    out = np.asarray(schedule.tiled_permutation(key, 60, 200))
    assert out.shape == (200,)
    # three full perms of range(60) + a perm of range(20)
    for r in range(3):
        np.testing.assert_array_equal(np.sort(out[r * 60 : (r + 1) * 60]), np.arange(60))
    np.testing.assert_array_equal(np.sort(out[180:]), np.arange(20))


def test_gan_learns_blobs():
    # 120/class, 3-fold -> uniform folds: train 480 / test 240 / labeled 480
    rng = np.random.RandomState(0)
    x, y = _blobs(rng, 120, 24)
    cfg = gan.GanConfig(epochs=15, batch_size=50, pad_multiple=8)
    errs = protocol.run_gan_cell(x, y, percentlabeled=8, cfg=cfg, seed=1, n_splits=3)
    assert errs.shape == (3,)
    assert errs.mean() < 0.15, f"GAN failed to learn separable blobs: {errs}"


def test_gan_percentunlabeled_path():
    rng = np.random.RandomState(2)
    x, y = _blobs(rng, 60, 16)
    cfg = gan.GanConfig(epochs=4, batch_size=50, pad_multiple=8)
    errs = protocol.run_gan_cell(
        x, y, percentlabeled=2, percentunlabeled=2, cfg=cfg, seed=3, n_splits=3
    )
    assert errs.shape == (3,)
    assert np.isfinite(errs).all()


def test_padding_equivalence():
    """Padded-feature training must stay statistically equivalent to unpadded
    (different noise draws, same problem — both solve easy blobs)."""
    rng = np.random.RandomState(4)
    x, y = _blobs(rng, 30, 20)
    cfg = gan.GanConfig(epochs=10, batch_size=50, pad_multiple=1)
    cfg_pad = gan.GanConfig(epochs=10, batch_size=50, pad_multiple=32)
    # pad_min buckets far beyond the data width (the table-5 fault dodge)
    cfg_min = gan.GanConfig(epochs=10, batch_size=50, pad_multiple=32,
                            pad_min=96)
    errs = protocol.run_gan_cell(x, y, 10, cfg=cfg, seed=7, n_splits=2)
    errs_pad = protocol.run_gan_cell(x, y, 10, cfg=cfg_pad, seed=7, n_splits=2)
    errs_min = protocol.run_gan_cell(x, y, 10, cfg=cfg_min, seed=7, n_splits=2)
    assert errs.mean() < 0.2 and errs_pad.mean() < 0.2, (errs, errs_pad)
    assert errs_min.mean() < 0.2, errs_min


def test_pad_features_min_dim():
    x = np.ones((3, 20), np.float32)
    xp, d = gan.pad_features(x, 32, 96)
    assert xp.shape == (3, 96) and d == 20
    np.testing.assert_array_equal(xp[:, 20:], 0.0)
    xp2, d2 = gan.pad_features(np.ones((3, 200), np.float32), 32, 96)
    assert xp2.shape == (3, 224) and d2 == 200  # min below natural pad: no-op


def test_mm_shadow_structure():
    p = {"d0": {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))},
         "bn": {"gamma": jnp.ones((3,)), "beta": jnp.zeros((3,))}}
    sh = gan._mm_shadow(p)
    assert sh["d0"]["w"].dtype == jnp.bfloat16      # matrices shadowed
    assert sh["d0"]["b"].dtype == jnp.float32       # vectors untouched
    assert sh["bn"]["gamma"].dtype == jnp.float32


def test_shadow_weights_equivalent_training():
    """matmul_weight_dtype bf16 vs f32 must solve the same problem to the
    same quality. (On TPU the dots are bitwise-identical — DEFAULT-precision
    f32 dots truncate operands to bf16 on the MXU anyway; on CPU, where f32
    dots are exact, the shadow path only perturbs low-order bits, so the
    comparison is statistical.)"""
    rng = np.random.RandomState(11)
    x, y = _blobs(rng, 30, 20)
    cfg32 = gan.GanConfig(epochs=10, batch_size=50, pad_multiple=8,
                          matmul_weight_dtype="float32")
    cfg16 = gan.GanConfig(epochs=10, batch_size=50, pad_multiple=8,
                          matmul_weight_dtype="bfloat16")
    errs32 = protocol.run_gan_cell(x, y, 10, cfg=cfg32, seed=5, n_splits=2)
    errs16 = protocol.run_gan_cell(x, y, 10, cfg=cfg16, seed=5, n_splits=2)
    assert errs32.mean() < 0.2 and errs16.mean() < 0.2, (errs32, errs16)
    # the two dtypes must actually track each other, not merely both pass
    assert abs(float(errs32.mean()) - float(errs16.mean())) < 0.1, (
        errs32, errs16)


def test_dense_mixed_dtype_matches_truncated_f32():
    from mrgan_tpu.models import nets

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    got = nets.dense({"w": w.astype(jnp.bfloat16), "b": b}, x)
    assert got.dtype == jnp.float32
    # reference: truncate W to bf16, accumulate in f32
    want = x @ w.astype(jnp.bfloat16).astype(jnp.float32) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dense_shadow_respects_explicit_precision():
    """A caller requesting HIGH/HIGHEST with bf16 shadow params must get the
    f32-upcast dot (the shadow fast path is only valid at DEFAULT precision)."""
    import jax
    import jax.numpy as jnp
    from mrgan_tpu.models import nets

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    w32 = rng.randn(16, 8).astype(np.float32)
    p_sh = {"w": jnp.asarray(w32).astype(jnp.bfloat16),
            "b": jnp.zeros((8,), jnp.float32)}
    got = nets.dense(p_sh, x, precision=jax.lax.Precision.HIGHEST)
    want = jnp.dot(x, p_sh["w"].astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # DEFAULT still takes the mixed fast path and returns f32
    out = nets.dense(p_sh, x)
    assert out.dtype == jnp.float32


def test_flat_small_carry_bitwise_identical():
    """flat_small_carry is a pure scan-carry relayout: training results must
    be BITWISE identical to the default layout, per fold."""
    rng = np.random.RandomState(13)
    x, y = _blobs(rng, 30, 20)
    cfg = gan.GanConfig(epochs=6, batch_size=50, pad_multiple=8)
    cfg_flat = dataclasses.replace(cfg, flat_small_carry=True)
    errs = protocol.run_gan_cell(x, y, 10, cfg=cfg, seed=9, n_splits=2)
    errs_flat = protocol.run_gan_cell(x, y, 10, cfg=cfg_flat, seed=9,
                                      n_splits=2)
    np.testing.assert_array_equal(np.asarray(errs), np.asarray(errs_flat))
