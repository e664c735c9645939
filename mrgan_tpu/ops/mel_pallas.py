"""Pallas TPU kernel: fused DFT -> power -> mel projection.

The GEMM-native frontend (ops.mel) expresses the spectrogram as three
XLA matmuls, which materializes the (B*T, 1+n_fft/2) power spectrum in HBM —
at 1 s of 48 kHz audio that intermediate is ~8x larger than the mel output.
This kernel fuses the whole chain per frame tile in VMEM:

    re    = frames_tile @ Cw[:, k-block]      (MXU)
    im    = frames_tile @ Sw[:, k-block]      (MXU)
    power = re*re + im*im                      (VPU, stays in VMEM)
    out  += power @ melW[k-block, :]           (MXU, accumulated over blocks)

Grid: (frame_tiles, k_blocks); the k dimension (frequency bins, padded to a
lane multiple) is the sequential inner axis so each output tile is revisited
with accumulation (TPU grid iteration is ordered). Frequency-blocking keeps
the window-premultiplied bases within VMEM.

The log/ref-max dB scaling stays in XLA (elementwise, fused for free).
Numerics match ops.mel.logmel (golden-tested against librosa 0.5.1
semantics); CPU tests run the kernel in interpreter mode.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mel as mel_ref

FRAME_TILE = 128     # frames per tile (MXU row dimension)
KBLOCK = 256         # frequency bins per block (lane multiple; sized so the
                     # HIGHEST-precision matmul scratch fits in 16 MB VMEM)


def _round_up(x, m):
    return -(-x // m) * m


_pallas_basis_cache = {}


def _padded_bases(sr, n_fft, n_mels):
    """Zero-pad the DFT/mel operator matrices to lane-aligned bin count."""
    key = (sr, n_fft, n_mels)
    if key not in _pallas_basis_cache:
        cw, sw, melw = mel_ref._dft_mel_bases(sr, n_fft, n_mels, np.float32)
        n_bins = cw.shape[1]
        k_pad = _round_up(n_bins, KBLOCK)
        cw_p = np.zeros((n_fft, k_pad), np.float32)
        sw_p = np.zeros((n_fft, k_pad), np.float32)
        melw_p = np.zeros((k_pad, melw.shape[1]), np.float32)
        cw_p[:, :n_bins] = cw
        sw_p[:, :n_bins] = sw
        melw_p[:n_bins, :] = melw
        _pallas_basis_cache[key] = (cw_p, sw_p, melw_p)
    return _pallas_basis_cache[key]


def _dot_bf16x3(a, b):
    """f32 matmul as 3 bf16 MXU passes (the classic bf16x3 split).

    Mosaic only lowers Precision.DEFAULT (1 pass) and HIGHEST (6 passes), so
    HIGH is built by hand: split each operand into a bf16 head and a bf16
    residual and drop only the tiny lo*lo term. Relative error ~2^-16 per
    element — ~1e-3 dB after the ref-max log scaling — at half HIGHEST's
    MXU work.
    """
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _mel_kernel(frames_ref, cw_ref, sw_ref, melw_ref, out_ref, *, precision):
    k = pl.program_id(1)
    # Precision ladder on the MXU (f32 operands decompose into bf16 passes):
    # DEFAULT = 1 pass (up to ~5 dB error after ref-max log scaling),
    # HIGH = 3 passes via _dot_bf16x3 (~1e-3 dB, half the MXU work),
    # HIGHEST = 6 passes (librosa-parity to ~5e-5 dB). The DFT matmuls below
    # are ~32x the FLOPs of the mel projection, so `precision` governs them;
    # the cheap mel GEMM always runs at HIGHEST.
    if precision == jax.lax.Precision.HIGH:
        re = _dot_bf16x3(frames_ref[:], cw_ref[:])
        im = _dot_bf16x3(frames_ref[:], sw_ref[:])
    else:
        re = jnp.dot(frames_ref[:], cw_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames_ref[:], sw_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
    power = re * re + im * im
    contrib = jnp.dot(power, melw_ref[:],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def mel_power(frames, sr=48000, n_fft=2048, n_mels=128, interpret=False,
              precision=jax.lax.Precision.HIGHEST):
    """Fused mel power spectrogram: (F, n_fft) frames -> (F, n_mels)."""
    # Canonicalize string spellings ("high", "highest", ...) so the kernel's
    # enum comparison — which routes HIGH to the hand-built bf16x3 path
    # Mosaic can lower — sees the same value for every accepted spelling.
    if not isinstance(precision, jax.lax.Precision):
        precision = jax.lax.Precision(precision)
    cw, sw, melw = _padded_bases(sr, n_fft, n_mels)
    f = frames.shape[0]
    f_pad = _round_up(f, FRAME_TILE)
    if f_pad != f:
        frames = jnp.pad(frames, ((0, f_pad - f), (0, 0)))
    k_pad = cw.shape[1]
    grid = (f_pad // FRAME_TILE, k_pad // KBLOCK)

    out = pl.pallas_call(
        partial(_mel_kernel, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((FRAME_TILE, n_fft), lambda i, k: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n_fft, KBLOCK), lambda i, k: (0, k),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n_fft, KBLOCK), lambda i, k: (0, k),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((KBLOCK, n_mels), lambda i, k: (k, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_TILE, n_mels), lambda i, k: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * f_pad * n_fft * k_pad * 2 + 2 * f_pad * k_pad * n_mels,
            bytes_accessed=(f_pad * n_fft + 2 * n_fft * k_pad
                            + k_pad * n_mels + f_pad * n_mels) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, jnp.asarray(cw), jnp.asarray(sw), jnp.asarray(melw))
    return out[:f]


@partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "n_mels", "flatten",
                     "interpret", "precision"),
)
def logmel(audio, sr=48000, n_fft=2048, hop_length=512, n_mels=128,
           flatten=True, interpret=False,
           precision=jax.lax.Precision.HIGHEST):
    """Drop-in for ops.mel.logmel with the fused Pallas core.

    audio: (B, N) -> (B, n_mels * T) flattened mel-major (or (B, n_mels, T)).
    precision=HIGH halves the MXU work of the dominant DFT GEMMs at ~1e-3 dB
    deviation from the golden librosa-0.5.1 semantics; HIGHEST (default) is
    the parity setting (~5e-5 dB).
    """
    audio = audio.astype(jnp.float32)
    b = audio.shape[0]
    t = mel_ref.num_frames(audio.shape[-1], hop_length)
    frames = mel_ref._frame(audio, n_fft, hop_length)  # (B, T, n_fft)
    mel = mel_power(frames.reshape(b * t, n_fft), sr, n_fft, n_mels,
                    interpret=interpret, precision=precision)
    mel = mel.reshape(b, t, n_mels)
    log_spec = 10.0 * jnp.log10(jnp.maximum(mel_ref._AMIN, mel))
    ref = jnp.max(mel, axis=(1, 2), keepdims=True)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(mel_ref._AMIN, ref))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - mel_ref._TOP_DB)
    out = jnp.swapaxes(log_spec, 1, 2)
    if flatten:
        return out.reshape(b, -1)
    return out
