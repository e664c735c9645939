"""Utility-layer tests: checkpoint store, metric stream, throughput meter,
parameter snapshots."""

import json
import os

import numpy as np
import jax

from mrgan_tpu.utils import checkpoint, metrics, params_io, profiling


def test_sweep_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "sweep.jsonl")
    ck = checkpoint.SweepCheckpoint(path)
    assert ck.get(table=1, modality=0, percent=4) is None
    ck.record([0.1, 0.2], table=1, modality=0, percent=4)
    assert ck.get(table=1, modality=0, percent=4) == [0.1, 0.2]
    # keys are order-insensitive
    assert ck.get(percent=4, table=1, modality=0) == [0.1, 0.2]
    # a fresh instance reloads from disk
    ck2 = checkpoint.SweepCheckpoint(path)
    assert ck2.get(table=1, modality=0, percent=4) == [0.1, 0.2]


def test_metric_stream(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ms = metrics.MetricStream(path)
    ms.emit("cell", table=1, errors=[0.1])
    ms.close()
    rec = json.loads(open(path).read().strip())
    assert rec["event"] == "cell" and rec["errors"] == [0.1]
    # a path-less stream is a no-op
    metrics.MetricStream(None).emit("x")


def test_throughput_meter(tmp_path):
    ms = metrics.MetricStream(str(tmp_path / "t.jsonl"))
    meter = profiling.Throughput(n_chips=2, stream=ms, metric="bench")
    meter.mark(100)
    v = meter.emit(cell="a")
    assert v > 0
    ms.close()
    rec = json.loads(open(str(tmp_path / "t.jsonl")).read().strip())
    assert rec["event"] == "bench" and rec["cell"] == "a"


def test_params_snapshot_roundtrip(tmp_path):
    params = {
        "gen": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "disc": [jax.numpy.ones((3,)), jax.numpy.zeros((2, 2))],
    }
    path = params_io.save(str(tmp_path / "snap"), params)
    assert os.path.exists(path)
    restored = params_io.restore(path)
    np.testing.assert_array_equal(np.asarray(restored["gen"]["w"]),
                                  np.asarray(params["gen"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored["disc"][0]),
                                  np.ones(3))


def test_scaler_guard_unified_across_paths():
    """ops.scaler is the single canonical StandardScaler: the jnp fit, the
    numpy twin, gan.scale_stats and protocol.scale_fold must all apply the
    same near-constant pass-through guard."""
    from mrgan_tpu.ops import scaler
    from mrgan_tpu.train import gan, protocol

    rng = np.random.RandomState(0)
    x = rng.randn(64, 5).astype(np.float32) * np.array(
        [1.0, 10.0, 100.0, 1.0, 1.0], np.float32)
    x[:, 3] = 2.5                       # exactly constant
    x[:, 4] = 80.0 + rng.randn(64).astype(np.float32) * 1e-6  # near-constant

    mean_j, scale_j = (np.asarray(a) for a in scaler.fit(x))
    mean_n, scale_n = scaler.fit_numpy(x.astype(np.float64))
    np.testing.assert_allclose(mean_j, mean_n, rtol=1e-5)
    np.testing.assert_allclose(scale_j, scale_n, rtol=1e-4)
    assert scale_j[3] == 1.0 and scale_j[4] == 1.0  # guard fired
    assert scale_j[0] != 1.0                        # real columns scaled

    mean_g, inv_g = (np.asarray(a) for a in gan.scale_stats(x))
    np.testing.assert_allclose(mean_g, mean_j)
    np.testing.assert_allclose(inv_g, 1.0 / scale_j)

    xt, _ = protocol.scale_fold(x.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(
        xt, (x.astype(np.float64) - mean_n) / scale_n)
