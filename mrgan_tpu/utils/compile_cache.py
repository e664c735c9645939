"""Persistent XLA compilation cache.

Sweep CLIs compile one program per cell shape; on remote-compile TPU setups
each compile costs minutes. Enabling JAX's persistent cache makes re-runs
(and checkpoint resumes) skip straight to execution.
"""

import os

import jax

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "mrgan_tpu_xla_cache")


def enable(cache_dir=None):
    cache_dir = cache_dir or os.environ.get("MRGAN_COMPILE_CACHE",
                                            DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:  # noqa: BLE001 — older jax or unsupported backend
        return None
