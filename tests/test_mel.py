"""Golden tests: GEMM-native frontend vs float64 librosa-0.5.1 reference."""

import numpy as np
import pytest

from golden import librosa051 as ref

from mrgan_tpu.ops import mel as mel_ops


def test_mel_filterbank_matches_reference():
    got = mel_ops.mel_filterbank(sr=48000, n_fft=2048, n_mels=128)
    want = ref.mel_filterbank(sr=48000, n_fft=2048, n_mels=128)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # Triangular filters: every filter has positive area, unimodal support
    assert (got.sum(axis=1) > 0).all()


def test_hann_window_periodic():
    w = mel_ops.hann_window(2048)
    want = ref.hann_window(2048)
    np.testing.assert_allclose(w, want, rtol=0, atol=1e-12)
    assert w[0] == 0.0  # periodic, not symmetric


@pytest.mark.parametrize("n_samples", [9600, 4800, 2400])
def test_logmel_matches_librosa051(n_samples):
    rng = np.random.RandomState(0)
    # Synthetic contact events: damped sinusoid bursts + noise, |x| ~ 0.1-200
    t = np.arange(n_samples) / 48000.0
    batch = []
    for i in range(4):
        f = 200.0 + 700.0 * i
        x = (
            100.0 * np.exp(-t * 30.0) * np.sin(2 * np.pi * f * t)
            + 0.5 * rng.randn(n_samples)
        )
        batch.append(x)
    batch = np.stack(batch)

    got = np.asarray(mel_ops.logmel(batch, flatten=False))
    want = np.stack([ref.reference_logmel(x) for x in batch])

    assert got.shape == want.shape == (4, 128, mel_ops.num_frames(n_samples))
    # dB-domain agreement: float32 GEMM-DFT vs float64 FFT
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_logmel_flatten_order_is_mel_major():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4800).astype(np.float32)
    flat = np.asarray(mel_ops.logmel(x, flatten=True))
    grid = np.asarray(mel_ops.logmel(x, flatten=False))
    # separate jit compiles may fuse differently -> tiny float drift
    np.testing.assert_allclose(flat, grid.reshape(2, -1), atol=1e-4)
    # reference flattening is log_S.flatten() with log_S of shape (n_mels, T)
    np.testing.assert_allclose(flat[0, : grid.shape[2]], grid[0, 0], atol=1e-4)


def test_logmel_top_db_floor():
    # Silence plus one impulse: floor must sit exactly 80 dB under the peak
    x = np.zeros((1, 4800), np.float32)
    x[0, 2400] = 1.0
    out = np.asarray(mel_ops.logmel(x, flatten=False))
    assert out.max() == pytest.approx(0.0, abs=1e-5)
    assert out.min() == pytest.approx(-80.0, abs=1e-5)


def test_logmel_dim():
    assert mel_ops.logmel_dim(9600) == 128 * 19
    assert mel_ops.logmel_dim(48000) == 128 * 94
