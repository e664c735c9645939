"""Fused Pallas mel kernel vs the GEMM-native reference frontend (which is
itself golden-tested against librosa 0.5.1 semantics). CPU runs use the
Pallas interpreter."""

import numpy as np
import jax

from mrgan_tpu.ops import mel as mel_ref
from mrgan_tpu.ops import mel_pallas

INTERPRET = jax.default_backend() != "tpu"


def test_mel_power_matches_reference():
    rng = np.random.RandomState(0)
    frames = rng.randn(70, 2048).astype(np.float32)  # non-multiple of tile
    got = np.asarray(mel_pallas.mel_power(frames, interpret=INTERPRET))
    cw, sw, melw = mel_ref._dft_mel_bases(48000, 2048, 128, np.float32)
    re = frames @ cw
    im = frames @ sw
    want = (re * re + im * im) @ melw
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_logmel_pallas_matches_gemm_frontend():
    rng = np.random.RandomState(1)
    audio = (rng.randn(3, 4800) * 100).astype(np.float32)
    want = np.asarray(mel_ref.logmel(audio))
    got = np.asarray(mel_pallas.logmel(audio, interpret=INTERPRET))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.02)  # dB scale


def test_logmel_pallas_high_precision_close():
    # precision=HIGH halves the MXU passes of the dominant DFT GEMMs; the dB
    # output must stay within a relaxed-but-tight tolerance of the golden
    # GEMM frontend. (In interpreter mode precision is exact f32, so this
    # mainly pins the API; on TPU it bounds the real bf16x3 error.)
    rng = np.random.RandomState(3)
    audio = (rng.randn(3, 4800) * 100).astype(np.float32)
    want = np.asarray(mel_ref.logmel(audio))
    got = np.asarray(
        mel_pallas.logmel(audio, interpret=INTERPRET,
                          precision=jax.lax.Precision.HIGH))
    np.testing.assert_allclose(got, want, atol=0.1)  # dB scale


def test_logmel_pallas_unflattened_layout():
    rng = np.random.RandomState(2)
    audio = rng.randn(2, 2400).astype(np.float32)
    out = np.asarray(mel_pallas.logmel(audio, flatten=False,
                                       interpret=INTERPRET))
    t = mel_ref.num_frames(2400)
    assert out.shape == (2, 128, t)
