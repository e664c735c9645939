"""MRGAN_PLATFORM must pin the JAX backend at package import.

On hosts whose site config pre-imports jax and registers a remote TPU
backend, JAX_PLATFORMS from the environment is consumed before user code
runs; the package-level hook uses jax.config (honored until first device
use). Run in a subprocess so this test controls the env and backend-init
ordering."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_mrgan_platform_pins_backend():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the hook must not depend on it
    env["MRGAN_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import mrgan_tpu, jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"
