"""Multi-host (DCN) helpers — single-process semantics.

The cross-slice path (jax.distributed.initialize with a real coordinator)
needs multiple processes; here we pin the single-process contracts every
table CLI relies on: initialize() no-ops without coordinator config, the
global mesh factors all visible devices into ("cell","data") with cells
never crossing the data axis, and process-local work sharding covers the
work axis exactly once across process ranks.
"""

import jax
import pytest
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


@pytest.mark.slow
def test_two_process_dcn_smoke():
    """Launch 2 real processes (4 virtual CPU devices each), initialize
    jax.distributed over a local coordinator, build the cross-process cell
    mesh, and train a sharded 8-cell GAN workload; each process asserts the
    sharded results equal its single-process recomputation (VERDICT r1 #8)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "_dcn_child.py")
    procs = [
        subprocess.Popen([sys.executable, child, addr, str(i)], env=env,
                         cwd=root, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # generous: two child processes each pay jax import + a
            # sharded-GAN compile, and CI hosts here have one core that
            # may be shared with concurrent jobs
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"DCN_SMOKE_OK process={i}" in out, out[-2000:]
