"""Multi-host (DCN) helpers — single-process semantics.

The cross-slice path (jax.distributed.initialize with a real coordinator)
needs multiple processes; here we pin the single-process contracts every
table CLI relies on: initialize() no-ops without coordinator config, the
global mesh factors all visible devices into ("cell","data") with cells
never crossing the data axis, and process-local work sharding covers the
work axis exactly once across process ranks.
"""

import jax
import numpy as np

from mrgan_tpu.parallel import multihost


def test_initialize_noop_without_config(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize() is False


def test_global_mesh_shapes():
    n = jax.device_count()
    m = multihost.global_mesh(n_data=1)
    assert m.axis_names == ("cell", "data")
    assert m.shape["cell"] == n and m.shape["data"] == 1

    m2 = multihost.global_mesh(n_data=2)
    assert m2.shape["cell"] == n // 2 and m2.shape["data"] == 2
    # every device appears at most once
    devs = list(np.asarray(m2.devices).ravel())
    assert len(devs) == len(set(devs)) == (n // 2) * 2


def test_shard_work_across_processes_single():
    start, stop = multihost.shard_work_across_processes(10)
    assert (start, stop) == (0, 10)  # single process owns everything


def test_shard_work_partition_covers_exactly(monkeypatch):
    # Simulate 3 processes partitioning 8 work items: ranges must tile
    # [0, 8) without overlap, in rank order.
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    spans = []
    for rank in range(3):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        spans.append(multihost.shard_work_across_processes(8))
    covered = [i for s, e in spans for i in range(s, e)]
    assert covered == list(range(8))
