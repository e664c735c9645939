"""GEMM-native log-mel spectrogram frontend.

Replaces the reference's per-example CPU librosa stack (mr_gan.py:44-47):

    S     = librosa.feature.melspectrogram(y, sr=48000, n_mels=128)
    log_S = librosa.logamplitude(S, ref_power=np.max)

with a batched, jittable, TPU-first pipeline. Instead of translating librosa's
FFT, the DFT is expressed as two real matmuls against window-premultiplied
cosine/sine bases so the whole frontend is three GEMMs that map straight onto
the MXU (frames @ C_w, frames @ S_w, power @ mel^T) plus fused elementwise
log/ max ops — the nnAudio / GEMM-native-NDFT formulation. Numerical semantics
(periodic hann, center reflect-pad, power-2 spectrogram, Slaney mel filterbank,
ref=max dB scaling with top_db=80) are pinned to librosa 0.5.1 and golden-tested
against tests/golden/librosa051.py.

All precomputed operator matrices are built once per (sr, n_fft, n_mels)
configuration in float64 numpy and cached.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

_AMIN = 1e-10
_TOP_DB = 80.0


# --------------------------------------------------------------------------
# Filterbank / basis construction (host-side, float64, cached)
# --------------------------------------------------------------------------

def hz_to_mel(frequencies):
    """Slaney mel scale (librosa 0.5.1, htk=False)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        frequencies >= min_log_hz,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )


def mel_to_hz(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )


def mel_filterbank(sr=48000, n_fft=2048, n_mels=128, fmin=0.0, fmax=None):
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1+n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def hann_window(n_fft):
    """Periodic hann window (librosa 0.5.1 stft default)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)


def num_frames(n_samples, hop_length=512):
    """Frame count for a centered STFT: 1 + n_samples // hop."""
    return 1 + n_samples // hop_length


def logmel_dim(n_samples, hop_length=512, n_mels=128):
    """Flattened feature size of the log-mel block for one window."""
    return n_mels * num_frames(n_samples, hop_length)


_basis_cache = {}


def _dft_mel_bases(sr, n_fft, n_mels, dtype):
    """Window-premultiplied DFT cos/sin bases and the mel projection.

    Returns (Cw, Sw, melW):
      Cw, Sw : (n_fft, n_bins)  so that  frames @ Cw = Re(rfft(frames*w)),
                                          frames @ Sw = -Im(rfft(frames*w))
      melW   : (n_bins, n_mels) transposed Slaney filterbank.
    """
    key = (sr, n_fft, n_mels, dtype)
    if key not in _basis_cache:
        n_bins = 1 + n_fft // 2
        n = np.arange(n_fft, dtype=np.float64)
        k = np.arange(n_bins, dtype=np.float64)
        ang = 2.0 * np.pi * np.outer(n, k) / n_fft
        w = hann_window(n_fft)[:, None]
        cw = np.cos(ang) * w
        sw = np.sin(ang) * w
        melw = mel_filterbank(sr=sr, n_fft=n_fft, n_mels=n_mels).T
        # Cache host numpy arrays (not jnp) so a first call from inside a jit
        # trace can't leak tracers into the cache; XLA embeds them as constants.
        np_dtype = np.dtype(dtype)
        _basis_cache[key] = (
            cw.astype(np_dtype),
            sw.astype(np_dtype),
            melw.astype(np_dtype),
        )
    return _basis_cache[key]


# --------------------------------------------------------------------------
# Jittable frontend
# --------------------------------------------------------------------------

def _frame(audio, n_fft, hop_length):
    """Center reflect-pad and frame a batch of waveforms: (B, N) -> (B, T, n_fft)."""
    pad = n_fft // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    t = num_frames(audio.shape[-1], hop_length)
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return padded[:, idx]


@partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "n_mels", "precision", "flatten"),
)
def logmel(
    audio,
    sr=48000,
    n_fft=2048,
    hop_length=512,
    n_mels=128,
    precision=jax.lax.Precision.HIGHEST,
    flatten=True,
):
    """Batched log-mel spectrogram with librosa 0.5.1 ref=max dB semantics.

    Args:
      audio: (B, N) float waveforms (N static).
      flatten: if True return (B, n_mels * T) in the reference's
        ``log_S.flatten()`` (mel-major) order; else (B, n_mels, T).

    Three-GEMM formulation: power = (F @ Cw)^2 + (F @ Sw)^2; mel = power @ melW;
    then the ref=max log-dB scaling is computed per example, fused by XLA.
    """
    audio = audio.astype(jnp.float32)
    cw, sw, melw = _dft_mel_bases(sr, n_fft, n_mels, jnp.float32)
    frames = _frame(audio, n_fft, hop_length)  # (B, T, n_fft)
    re = jnp.einsum("btn,nk->btk", frames, cw, precision=precision)
    im = jnp.einsum("btn,nk->btk", frames, sw, precision=precision)
    power = re * re + im * im  # (B, T, n_bins)
    mel = jnp.einsum("btk,km->btm", power, melw, precision=precision)  # (B, T, n_mels)
    log_spec = 10.0 * jnp.log10(jnp.maximum(_AMIN, mel))
    ref = jnp.max(mel, axis=(1, 2), keepdims=True)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(_AMIN, ref))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - _TOP_DB)
    out = jnp.swapaxes(log_spec, 1, 2)  # (B, n_mels, T) — librosa layout
    if flatten:
        return out.reshape(out.shape[0], -1)
    return out


def frontend_logmel(audio, sr=48000, n_fft=2048, hop_length=512, n_mels=128,
                    flatten=True):
    """Production dataset-build mel frontend (the mr_gan.py:44-47 surface).

    Dispatches to the fused Pallas kernel (ops.mel_pallas) on TPU — 2.3x the
    GEMM path device-resident at HIGHEST precision (~5e-5 dB vs the golden
    librosa-0.5.1 fixtures), 3.2x at HIGH (manual bf16x3, ~1.5e-3 dB) — and
    to the GEMM path elsewhere (Pallas/Mosaic only lowers for TPU; the
    interpreter is far slower than the GEMM formulation on CPU).

    Env overrides:
      MRGAN_MEL_BACKEND   = auto (default) | gemm | pallas
      MRGAN_MEL_PRECISION = highest (default, parity) | high (bf16x3 opt-in)
    """
    import os

    backend = os.environ.get("MRGAN_MEL_BACKEND", "auto").lower()
    prec_name = os.environ.get("MRGAN_MEL_PRECISION", "highest").lower()
    precisions = {"highest": jax.lax.Precision.HIGHEST,
                  "high": jax.lax.Precision.HIGH}
    if prec_name not in precisions:
        raise ValueError(
            "MRGAN_MEL_PRECISION=%r; valid: %s (DEFAULT/1-pass-bf16 is "
            "rejected for parity use — 4.9 dB off the golden fixtures)"
            % (prec_name, "/".join(precisions)))
    precision = precisions[prec_name]
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "gemm"
    elif backend not in ("gemm", "pallas"):
        raise ValueError("MRGAN_MEL_BACKEND=%r; valid: auto/gemm/pallas"
                         % (backend,))
    if backend == "pallas":
        from . import mel_pallas

        return mel_pallas.logmel(audio, sr=sr, n_fft=n_fft,
                                 hop_length=hop_length, n_mels=n_mels,
                                 flatten=flatten, precision=precision)
    return logmel(audio, sr=sr, n_fft=n_fft, hop_length=hop_length,
                  n_mels=n_mels, flatten=flatten, precision=precision)


@lru_cache(maxsize=64)
def _logmel_sharded_fn(mesh, axis, sr, n_fft, hop_length, n_mels, tb,
                       precision):
    """Build (once per mesh/frontend/frame-block combo) the jitted
    shard_mapped mel program. The jit wrapper MUST be cached: a fresh
    wrapper per call would retrace and recompile every invocation."""
    from jax.sharding import PartitionSpec as P

    cw, sw, melw = _dft_mel_bases(sr, n_fft, n_mels, jnp.float32)

    def local(a):
        i = jax.lax.axis_index(axis)
        # frames [i*tb, (i+1)*tb) of every example, gathered from the
        # replicated padded audio
        starts = (i * tb + jnp.arange(tb)) * hop_length
        idx = starts[:, None] + jnp.arange(n_fft)[None, :]
        frames = a[:, idx]  # (B, tb, n_fft)
        re = jnp.einsum("btn,nk->btk", frames, cw, precision=precision)
        im = jnp.einsum("btn,nk->btk", frames, sw, precision=precision)
        mel = jnp.einsum("btk,km->btm", re * re + im * im, melw,
                         precision=precision)
        # global per-example ref across frame blocks
        ref = jax.lax.pmax(jnp.max(mel, axis=(1, 2)), axis)[:, None, None]
        log_spec = 10.0 * jnp.log10(jnp.maximum(_AMIN, mel))
        log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(_AMIN, ref))
        peak = jax.lax.pmax(jnp.max(log_spec, axis=(1, 2)), axis)[:, None, None]
        log_spec = jnp.maximum(log_spec, peak - _TOP_DB)
        return jnp.swapaxes(log_spec, 1, 2)  # (B, n_mels, tb)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(),
                       out_specs=P(None, None, axis))
    return jax.jit(fn)


def logmel_sharded(audio, mesh, axis="data", sr=48000, n_fft=2048,
                   hop_length=512, n_mels=128,
                   precision=jax.lax.Precision.HIGHEST):
    """Frame-block sequence parallelism for the mel frontend (SURVEY.md
    §2.3's honest CP analog): STFT frames are independent given the center
    padding, so each device computes a contiguous block of frames of EVERY
    example — arbitrarily long contact windows stream through per-chip
    VMEM/HBM — and only the per-example ref-max/peak reductions cross shards
    (two pmax collectives on (B,) vectors).

    audio: (B, N); the frame count T = 1 + N//hop must be divisible by the
    mesh axis size (pad N if needed). Returns (B, n_mels, T).
    """
    n_sh = mesh.shape[axis]
    t = num_frames(audio.shape[-1], hop_length)
    assert t % n_sh == 0, (
        f"frame count {t} not divisible by mesh axis {axis}={n_sh}; pad the "
        f"audio length")
    pad = n_fft // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)),
                     mode="reflect")
    fn = _logmel_sharded_fn(mesh, axis, sr, n_fft, hop_length, n_mels,
                            t // n_sh, precision)
    return fn(padded)
