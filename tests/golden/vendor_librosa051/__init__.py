"""Vendored transcription of the librosa 0.5.1 code path reached by the
reference frontend (mr_gan.py:44-47):

    S     = librosa.feature.melspectrogram(y=x, sr=48000, n_mels=128)
    log_S = librosa.logamplitude(S, ref_power=np.max)

Package layout mirrors librosa's (filters / core.spectrum / util / feature)
so every function can be checked against the pinned version line by line.
See util.py's module docstring for why this is a transcription (librosa is
not installable here) and how it is independently witnessed.
"""

import numpy as np

from . import filters, spectrum, util  # noqa: F401
from .spectrum import logamplitude, stft  # noqa: F401


def melspectrogram(y=None, sr=22050, S=None, n_fft=2048, hop_length=512,
                   power=2.0, **kwargs):
    """librosa 0.5.1 feature.melspectrogram (librosa/feature/spectral.py)."""
    S, n_fft = spectrum._spectrogram(y=y, S=S, n_fft=n_fft,
                                     hop_length=hop_length, power=power)
    mel_basis = filters.mel(sr, n_fft, **kwargs)
    return np.dot(mel_basis, S)


def reference_logmel(y, sr=48000, n_mels=128):
    """The exact reference frontend call chain (mr_gan.py:44-47)."""
    S = melspectrogram(y=np.asarray(y), sr=sr, n_mels=n_mels)
    return logamplitude(S, ref_power=np.max)
