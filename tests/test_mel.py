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


# ---------------------------------------------------------------------------
# Committed fixtures + independent witnesses for the golden oracle itself
# (VERDICT r1: the oracle must not be solely author-derived math)
# ---------------------------------------------------------------------------

import os

from golden import vendor_librosa051 as v051

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "fixtures")


def _fixture_names():
    return sorted(f[3:-4] for f in os.listdir(FIXDIR) if f.startswith("in_"))


def test_fixtures_are_committed_and_reproducible():
    """The committed .npy outputs must match a fresh run of the vendored
    0.5.1 transcription — guards accidental edits of either side."""
    names = _fixture_names()
    assert len(names) >= 6
    for name in names:
        x = np.load(os.path.join(FIXDIR, f"in_{name}.npy"))
        want = np.load(os.path.join(FIXDIR, f"logmel_{name}.npy"))
        np.testing.assert_allclose(v051.reference_logmel(x), want,
                                   rtol=0, atol=1e-12, err_msg=name)
    fb = np.load(os.path.join(FIXDIR, "melfb_48k_2048_128.npy"))
    np.testing.assert_array_equal(v051.filters.mel(48000, 2048, n_mels=128),
                                  fb)


def test_ops_mel_matches_committed_fixtures():
    """The on-device frontend asserts against the committed fixture files,
    not against oracle code run at test time."""
    for name in _fixture_names():
        x = np.load(os.path.join(FIXDIR, f"in_{name}.npy"))[None].astype(
            np.float32)
        want = np.load(os.path.join(FIXDIR, f"logmel_{name}.npy"))
        got = np.asarray(mel_ops.logmel(x, flatten=False))[0]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=7e-3, err_msg=name)


def test_vendored_stft_matches_torch():
    """Independent-implementation witness: torch.stft (C++ ATen FFT, its own
    framing/padding code) must agree with the vendored 0.5.1 stft under the
    pinned conventions (periodic hann, center=True reflect pad, hop 512)."""
    import torch

    for name in _fixture_names():
        x = np.load(os.path.join(FIXDIR, f"in_{name}.npy"))
        want = np.load(os.path.join(FIXDIR, f"stft_{name}.npy"))
        got = torch.stft(
            torch.from_numpy(x), n_fft=2048, hop_length=512,
            window=torch.hann_window(2048, periodic=True,
                                     dtype=torch.float64),
            center=True, pad_mode="reflect", onesided=True,
            return_complex=True,
        ).numpy()
        assert got.shape == want.shape, name
        np.testing.assert_allclose(got, want, rtol=0,
                                   atol=2e-4 * np.abs(want).max(),
                                   err_msg=name)


def test_vendored_melfb_analytic_properties():
    """Analytic witnesses of the Slaney filterbank, derived from the mel-scale
    definition rather than from any implementation:
    - centers are linear (200/3 Hz per mel) below 1 kHz, log above;
    - each filter is a triangle supported on [f[i], f[i+2]] peaking at f[i+1];
    - norm=1 scales each triangle to peak height 2/(f[i+2]-f[i]);
    - adjacent unnormalized triangles partition unity between centers."""
    sr, n_fft, n_mels = 48000, 2048, 128
    fb = np.load(os.path.join(FIXDIR, "melfb_48k_2048_128.npy"))
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)

    # independently-computed band edges from the published Slaney formula
    def mel_of(f):
        lin = f / (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        return np.where(f < 1000.0, lin,
                        brk + np.log(np.maximum(f, 1e-9) / 1000.0)
                        / (np.log(6.4) / 27.0))

    def hz_of(m):
        brk = 1000.0 / (200.0 / 3)
        return np.where(m < brk, m * (200.0 / 3),
                        1000.0 * np.exp((np.log(6.4) / 27.0) * (m - brk)))

    edges = hz_of(np.linspace(mel_of(np.float64(0.0)),
                              mel_of(np.float64(sr / 2)), n_mels + 2))
    for i in range(0, n_mels, 17):
        lo, mid, hi = edges[i], edges[i + 1], edges[i + 2]
        peak = 2.0 / (hi - lo)
        # triangle evaluated directly at the FFT frequencies
        tri = np.clip(np.minimum((freqs - lo) / (mid - lo),
                                 (hi - freqs) / (hi - mid)), 0, None) * peak
        np.testing.assert_allclose(fb[i], tri, rtol=1e-8, atol=1e-12)
    # partition of unity for unnormalized triangles between centers
    unnorm = fb / (2.0 / (edges[2:] - edges[:-2]))[:, None]
    interior = (freqs > edges[1]) & (freqs < edges[-2])
    np.testing.assert_allclose(unnorm.sum(0)[interior], 1.0, rtol=1e-9)


def test_logmel_sharded_program_is_cached():
    # A fresh jit wrapper per call would retrace/recompile every invocation.
    from mrgan_tpu.ops import mel as mel_ops
    mel_ops._logmel_sharded_fn.cache_clear()
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    a = np.random.RandomState(0).randn(2, 4096).astype(np.float32)
    out1 = mel_ops.logmel_sharded(a, mesh)
    out2 = mel_ops.logmel_sharded(a * 2.0, mesh)
    info = mel_ops._logmel_sharded_fn.cache_info()
    assert info.misses == 1 and info.hits == 1
    assert out1.shape == out2.shape


def test_assemble_mel_kwargs_passthrough():
    # assemble's mel kwargs must match feature_dim's size computation
    from mrgan_tpu.ops import features
    a = np.random.RandomState(1).randn(3, 4096).astype(np.float32)
    for n_mels, hop in ((32, 256), (64, 1024)):
        got = features.assemble(3, contact=a, n_mels=n_mels, hop_length=hop)
        want = features.feature_dim(3, 0, 4096, n_mels=n_mels, hop_length=hop)
        assert got.shape == (3, want)
