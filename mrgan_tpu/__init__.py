"""mrgan_tpu — TPU-native (JAX/XLA/Pallas/pjit) material-recognition framework.

A ground-up rebuild of the capabilities of Healthcare-Robotics/mr-gan
(CoRL 2017 semi-supervised haptic material recognition) as an idiomatic
TPU framework:

- ``ops``      fused on-device signal frontend (GEMM-native STFT -> mel -> log-dB,
               impact-window lerp resampling, standard scaling) replacing the
               reference's librosa/scipy CPU stack (mr_gan.py:44-47,
               processdata.py:56-83).
- ``models``   generator / discriminator / MLP nets and the Salimans
               feature-matching losses (mr_gan.py:110-158) as pure functions
               over parameter pytrees.
- ``train``    fused disc+gen train steps under ``jit`` with ``lax.scan``
               epoch loops replacing the reference's 7M host-driven kernel
               launches (mr_gan.py:183-228).
- ``parallel`` sweep/fold/data parallelism over ``jax.sharding.Mesh``
               (the reference is single-device; the sweep axis is where the
               TPU speedup comes from).
- ``data``     MREO pickle loaders (mr_gan.py:23-71 semantics) plus a
               synthetic MREO generator so every table protocol runs
               without the 1 GB dataset.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MRGAN_PLATFORM"):
    # Select the JAX backend for any mrgan_tpu entry point. JAX's own
    # JAX_PLATFORMS env var is not enough on hosts whose site config
    # pre-imports jax and registers a remote TPU backend (it is read at
    # import time); jax.config still honors an update made before first
    # device use, which package import is.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MRGAN_PLATFORM"])

MATERIALS = ("plastic", "glass", "fabric", "metal", "wood", "ceramic")
NUM_CLASSES = len(MATERIALS)

MODALITY_NAMES = (
    "Force",
    "Temperature",
    "Force and Temperature",
    "Contact mic",
    "Temperature and Contact Mic",
    "Force, Temperature, and Contact Mic",
    "Force and Contact Mic",
)
