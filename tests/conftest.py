"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware, per SURVEY.md §4.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers a remote TPU backend), so setting JAX_PLATFORMS via os.environ is too
late — we must flip the platform through jax.config after import, and XLA_FLAGS
before the first backend initialization.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
