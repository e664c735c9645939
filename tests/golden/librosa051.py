"""Pure-numpy golden reference for librosa 0.5.1 semantics.

The reference pipeline computes, per contact-mic window (mr_gan.py:44-47):

    S     = librosa.feature.melspectrogram(y, sr=48000, n_mels=128)
    log_S = librosa.logamplitude(S, ref_power=np.max)

with librosa 0.5.1 defaults: n_fft=2048, hop_length=512, power=2.0,
window=periodic hann, center=True with reflect padding, Slaney-style mel
filterbank (htk=False, fmin=0, fmax=sr/2, area normalization), and
logamplitude(amin=1e-10, top_db=80.0).

librosa is not installed in this environment, so this module re-derives those
exact semantics in straightforward float64 numpy. It exists only as the golden
oracle for tests of the fast on-device frontend in mrgan_tpu.ops.mel; it is
deliberately slow and simple.
"""

import numpy as np


def hz_to_mel(frequencies):
    """Slaney mel scale (librosa 0.5.1 core.time_frequency.hz_to_mel, htk=False)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    f_min = 0.0
    f_sp = 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = frequencies >= min_log_hz
        mels[log_t] = min_log_mel + np.log(frequencies[log_t] / min_log_hz) / logstep
    elif frequencies >= min_log_hz:
        mels = min_log_mel + np.log(frequencies / min_log_hz) / logstep
    return mels


def mel_to_hz(mels):
    """Inverse of hz_to_mel (Slaney)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min = 0.0
    f_sp = 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def mel_frequencies(n_mels, fmin, fmax):
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels)
    return mel_to_hz(mels)


def mel_filterbank(sr=48000, n_fft=2048, n_mels=128, fmin=0.0, fmax=None):
    """librosa 0.5.1 filters.mel(sr, n_fft, n_mels, htk=False, norm=1)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    weights = np.zeros((n_mels, n_bins), dtype=np.float64)
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax)
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # norm=1 ("slaney"): area-normalize each filter
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, np.newaxis]
    return weights


def hann_window(n_fft):
    """Periodic hann, == scipy.signal.get_window('hann', n, fftbins=True)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)


def stft(y, n_fft=2048, hop_length=512):
    """librosa 0.5.1 core.stft defaults: periodic hann, center=True, reflect pad.

    Returns complex spectrogram of shape (1 + n_fft//2, n_frames).
    """
    y = np.asarray(y, dtype=np.float64)
    window = hann_window(n_fft)
    y = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    frames = np.stack(
        [y[i * hop_length : i * hop_length + n_fft] for i in range(n_frames)], axis=0
    )
    return np.fft.rfft(frames * window, axis=-1).T


def melspectrogram(y, sr=48000, n_fft=2048, hop_length=512, n_mels=128, power=2.0):
    S = np.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** power
    return mel_filterbank(sr=sr, n_fft=n_fft, n_mels=n_mels) @ S


def logamplitude(S, amin=1e-10, top_db=80.0):
    """librosa 0.5.1 logamplitude with ref_power=np.max."""
    S = np.asarray(S, dtype=np.float64)
    ref_value = np.abs(np.max(S))
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def reference_logmel(y, sr=48000, n_mels=128):
    """The exact frontend of mr_gan.py:44-47, as float64 numpy."""
    return logamplitude(melspectrogram(y, sr=sr, n_mels=n_mels))


def interp1d_linear(x, y, x_new):
    """scipy.interpolate.interp1d(x, y)(x_new) for the in-range linear case
    used by processdata.py:60-83."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x_new = np.asarray(x_new, dtype=np.float64)
    idx = np.searchsorted(x, x_new, side="left")
    idx = np.clip(idx, 1, len(x) - 1)
    x0, x1 = x[idx - 1], x[idx]
    y0, y1 = y[idx - 1], y[idx]
    t = (x_new - x0) / (x1 - x0)
    out = y0 + t * (y1 - y0)
    exact = x_new == x[np.clip(idx, 0, len(x) - 1)]
    # interp1d returns exact knot values where x_new lands on a knot
    out = np.where(exact, y[np.clip(idx, 0, len(x) - 1)], out)
    return out
