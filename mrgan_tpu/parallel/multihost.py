"""Multi-host (DCN) initialization helpers.

Within a slice, sweep/data sharding rides ICI (parallel.mesh/sweep/spmd).
Across slices/hosts, JAX needs ``jax.distributed.initialize`` before any
backend use; this module wraps that plus a global-mesh constructor so table
sweeps can span pods: each host feeds its local shard of the stacked work
axis (jax.make_array_from_process_local_data) and the cell axis spans all
processes. Single-process runs are unaffected (initialize() no-ops).
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize from args or the standard env variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Safe to
    call in single-process runs (returns False, does nothing)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_data=1):
    """("cell","data") mesh over ALL processes' devices; the cell axis spans
    hosts so independent sweep cells never cross DCN, and only the (optional)
    data axis pays intra-slice collectives."""
    devices = np.asarray(jax.devices())
    n_cell = len(devices) // n_data
    return Mesh(devices[: n_cell * n_data].reshape(n_cell, n_data),
                ("cell", "data"))


def shard_work_across_processes(n_work):
    """Split a work axis of size n_work across processes: returns the
    (start, stop) range this process should materialize host-side."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_work // n)
    return min(p * per, n_work), min((p + 1) * per, n_work)
