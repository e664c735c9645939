"""Transcription of librosa 0.5.1 ``librosa/util/utils.py`` (the subset the
mr-gan frontend reaches): ``frame`` and ``pad_center``.

librosa is not installable in this environment (no network, pinned image), so
this package is a structure-faithful transcription of the pinned version's
code path — same functions, same defaults, same dtype behavior (stride-tricks
framing, float32 windows applied to float64 audio, complex64 STFT) — rather
than a fresh mathematical re-derivation. Its outputs are additionally
cross-witnessed in tests/test_mel.py against torch.stft (an independent
C++ FFT + framing implementation) and analytic filterbank properties, and
frozen as committed .npy fixtures (tests/golden/fixtures) so the oracle can
never silently drift with this repo's code.
"""

import numpy as np


def frame(y, frame_length=2048, hop_length=512):
    """librosa.util.frame: stride-tricks view, shape (frame_length, n_frames),
    Fortran-style layout (column per frame)."""
    if len(y) < frame_length:
        raise ValueError("Buffer is too short for frame_length")
    if hop_length < 1:
        raise ValueError("Invalid hop_length")
    if not y.flags["C_CONTIGUOUS"]:
        raise ValueError("Input buffer must be contiguous")
    n_frames = 1 + int((len(y) - frame_length) / hop_length)
    return np.lib.stride_tricks.as_strided(
        y,
        shape=(frame_length, n_frames),
        strides=(y.itemsize, hop_length * y.itemsize),
    )


def pad_center(data, size, axis=-1, **kwargs):
    """librosa.util.pad_center: center ``data`` in a length-``size`` buffer."""
    kwargs.setdefault("mode", "constant")
    n = data.shape[axis]
    lpad = int((size - n) // 2)
    lengths = [(0, 0)] * data.ndim
    lengths[axis] = (lpad, int(size - n - lpad))
    if lpad < 0:
        raise ValueError("Target size must be at least input size")
    return np.pad(data, lengths, **kwargs)
