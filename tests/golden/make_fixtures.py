"""Generate the committed golden .npy fixtures from the vendored librosa-0.5.1
transcription (run from repo root: ``python -m tests.golden.make_fixtures``).

The fixtures are COMMITTED; tests assert against the .npy files, not against
code run at test time, so the oracle cannot silently drift with this repo.
Regenerating requires rerunning this script deliberately (and the
cross-witness tests in test_mel.py re-validate the vendored transcription
against torch.stft and analytic filterbank properties whenever they run).
"""

import os

import numpy as np

from . import vendor_librosa051 as v051

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures")


def signals():
    """Deterministic contact-mic-like test signals spanning the frontend's
    regimes: damped-burst events (the physical signal class), an impulse
    (top_db floor), silence+tone, and broadband noise; lengths cover the
    Table-5 duration grid endpoints (0.05 s and 1 s at 48 kHz)."""
    rng = np.random.RandomState(1234)
    out = {}
    for n, tag in ((2400, "50ms"), (9600, "200ms"), (48000, "1s")):
        t = np.arange(n) / 48000.0
        out[f"burst_{tag}"] = (
            100.0 * np.exp(-t * 30.0) * np.sin(2 * np.pi * 440.0 * t)
            + 20.0 * np.exp(-t * 80.0) * np.sin(2 * np.pi * 3150.0 * t)
            + 0.5 * rng.randn(n)
        )
    imp = np.zeros(4800)
    imp[2400] = 1.0
    out["impulse_100ms"] = imp
    t = np.arange(9600) / 48000.0
    out["tone_200ms"] = 0.01 * np.sin(2 * np.pi * 1000.0 * t)
    out["noise_200ms"] = rng.randn(9600) * 3.0
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    np.save(os.path.join(OUT, "melfb_48k_2048_128.npy"),
            v051.filters.mel(48000, 2048, n_mels=128))
    for name, x in signals().items():
        np.save(os.path.join(OUT, f"in_{name}.npy"), x)
        np.save(os.path.join(OUT, f"logmel_{name}.npy"),
                v051.reference_logmel(x))
        np.save(os.path.join(OUT, f"stft_{name}.npy"),
                v051.stft(x))
    print("wrote fixtures to", OUT)


if __name__ == "__main__":
    main()
