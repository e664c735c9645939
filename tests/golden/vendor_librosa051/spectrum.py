"""Transcription of librosa 0.5.1 ``librosa/core/spectrum.py`` (the subset the
mr-gan frontend reaches): ``stft`` and ``logamplitude``. See util.py's module
docstring for the transcription/witnessing methodology.

Pinned-version semantics preserved deliberately:
- ``scipy.fftpack.fft`` over the full n_fft (then sliced to 1 + n_fft//2),
  not rfft — 0.5.1 predates librosa's fft-lib indirection;
- the STFT matrix is ``np.complex64`` regardless of input dtype;
- window from ``scipy.signal.get_window(..., fftbins=True)`` (periodic hann),
  padded to n_fft and reshaped to a column;
- center=True reflect-pads by n_fft//2;
- the block loop bounded by MAX_MEM_BLOCK (2**8 * 2**10 bytes).
"""

import numpy as np
import scipy.fftpack as fft
import scipy.signal

from . import util

MAX_MEM_BLOCK = 2**8 * 2**10


def get_window(window, win_length, fftbins=True):
    """librosa.filters.get_window, for the string/callable cases the frontend
    uses (0.5.1 delegates to scipy.signal.get_window)."""
    if callable(window):
        return window(win_length)
    return scipy.signal.get_window(window, win_length, fftbins=fftbins)


def stft(y, n_fft=2048, hop_length=None, win_length=None, window="hann",
         center=True, dtype=np.complex64, pad_mode="reflect"):
    """librosa 0.5.1 core.stft. Returns (1 + n_fft//2, n_frames) complex64."""
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = int(win_length // 4)

    fft_window = get_window(window, win_length, fftbins=True)
    fft_window = util.pad_center(fft_window, n_fft)
    fft_window = fft_window.reshape((-1, 1))

    if center:
        y = np.pad(y, int(n_fft // 2), mode=pad_mode)

    y_frames = util.frame(y, frame_length=n_fft, hop_length=hop_length)

    stft_matrix = np.empty(
        (int(1 + n_fft // 2), y_frames.shape[1]), dtype=dtype, order="F"
    )
    n_columns = int(MAX_MEM_BLOCK / (stft_matrix.shape[0] * stft_matrix.itemsize))
    for bl_s in range(0, stft_matrix.shape[1], n_columns):
        bl_t = min(bl_s + n_columns, stft_matrix.shape[1])
        stft_matrix[:, bl_s:bl_t] = fft.fft(
            fft_window * y_frames[:, bl_s:bl_t], axis=0
        )[: stft_matrix.shape[0]]
    return stft_matrix


def _spectrogram(y=None, S=None, n_fft=2048, hop_length=512, power=1):
    """librosa 0.5.1 core.spectrum._spectrogram."""
    if S is not None:
        n_fft = 2 * (S.shape[0] - 1)
    else:
        S = np.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** power
    return S, n_fft


def logamplitude(S, ref_power=1.0, amin=1e-10, top_db=80.0):
    """librosa 0.5.1 logamplitude (pre-0.6 semantics: ``ref_power`` may be a
    callable applied to the magnitude — the reference passes np.max,
    mr_gan.py:46)."""
    magnitude = np.abs(S)
    if callable(ref_power):
        __ref = ref_power(magnitude)
    else:
        __ref = np.abs(ref_power)
    log_spec = 10.0 * np.log10(np.maximum(amin, magnitude))
    log_spec -= 10.0 * np.log10(np.maximum(amin, __ref))
    if top_db is not None:
        if top_db < 0:
            raise ValueError("top_db must be non-negative")
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec
