"""End-to-end preprocessing pipeline tests: synthetic raw pickles through the
batched on-device window+lerp path, validated sample-by-sample against a
direct scipy interp1d reimplementation of the reference's processdata.py
semantics (argmax windowing, linspace grids, the contact off-by-one)."""

import os
import pickle

import numpy as np
import pytest
from scipy.interpolate import interp1d

from mrgan_tpu.data import preprocess, synthetic


def _reference_process(raw, duration, contact_len):
    """Literal scipy transcription of processdata.py:41-85 (trusted oracle)."""
    n_ft = int(100 * duration)
    n_c = int(48000 * contact_len)
    out = {k: [] for k in ("force0", "force1", "temperature", "contact",
                           "pressure0", "pressure1")}
    for i in range(len(raw["collisionTime"])):
        impact = raw["collisionTime"][i]
        ft = np.asarray(raw["RGripRFingerTime"][i], np.float64)
        force = np.asarray(raw["RGripRFingerForce"][i], np.float64)
        pressure = np.asarray(raw["RGripRFingerPressure"][i], np.float64)
        pre = np.argmax(ft > impact - 0.1)
        post = len(ft) if ft[-1] <= impact + duration else np.argmax(
            ft > impact + duration)
        grid = np.linspace(ft[pre], ft[post - 1], num=n_ft, endpoint=True)
        out["force0"].append(interp1d(ft[pre:post], force[pre:post, 3])(grid))
        out["force1"].append(interp1d(ft[pre:post], force[pre:post, 4])(grid))
        out["pressure0"].append(
            interp1d(ft[pre:post], pressure[pre:post, 3])(grid))
        out["pressure1"].append(
            interp1d(ft[pre:post], pressure[pre:post, 4])(grid))

        tt = np.asarray(raw["temperatureTime"][i], np.float64)
        temp = np.asarray(raw["temperatureRaw"][i], np.float64)
        pre = np.argmax(tt > impact - 0.1)
        post = len(tt) if tt[-1] <= impact + duration else np.argmax(
            tt > impact + duration)
        grid = np.linspace(tt[pre], tt[post - 1], num=n_ft, endpoint=True)
        out["temperature"].append(interp1d(tt[pre:post], temp[pre:post, 1])(grid))

        ct = np.asarray(raw["contactmicTime"][i], np.float64)
        mic = np.asarray(raw["contactmic"][i], np.float64)
        pre = np.argmax(ct > impact - contact_len / 2.0)
        post = np.argmax(ct > impact + contact_len / 2.0)
        grid = np.linspace(ct[pre + 1], ct[post - 1], num=n_c, endpoint=True)
        out["contact"].append(interp1d(ct[pre:post], mic[pre:post])(grid))
    return out


@pytest.mark.parametrize("duration,contact_len", [(0.5, 0.05), (2, 0.1)])
def test_pipeline_matches_scipy_reference(duration, contact_len):
    raw = synthetic.generate_raw_file(seed=1, material="glass", pokes=3,
                                      record_s=3.0, impact_s=0.4)
    got = preprocess.process_sequences(raw, duration, contact_len)
    want = _reference_process(raw, duration, contact_len)
    for key, atol in (("force0", 1e-3), ("force1", 1e-3), ("pressure0", 2e-2),
                      ("pressure1", 2e-2), ("temperature", 1e-3),
                      ("contact", 1e-2)):
        g = np.asarray(got[key])
        w = np.asarray(want[key])
        assert g.shape == w.shape, key
        scale = max(1.0, np.abs(w).max())
        np.testing.assert_allclose(g, w, atol=atol * scale, err_msg=key)


@pytest.mark.slow
def test_raw_to_tables_end_to_end(tmp_path, monkeypatch, capsys):
    """The complete vertical slice without a PR2 (SURVEY §7 item 9): raw
    pickles in the collection stack's save schema -> preprocess.run (the
    processdata.py semantics, reference processdata.py:10-92) ->
    processed_0.1sbefore pickles -> mreo loader -> a real (tiny) GAN table-1
    cell through the production CLI, checkpointed, with finite fold errors."""
    import json

    from mrgan_tpu import MATERIALS
    from mrgan_tpu.cli import tables

    raw_dir = tmp_path / "data_raw"
    out_dir = tmp_path / "data_processed"
    raw_dir.mkdir()
    for mi, material in enumerate(MATERIALS):
        for obj in range(2):
            raw = synthetic.generate_raw_file(
                seed=100 * mi + obj, material=material, pokes=3)
            with open(raw_dir / f"newdata_{material}_obj{obj}_batch0.pkl",
                      "wb") as f:
                pickle.dump(raw, f)

    # Table 1/2/3/6 read the (forcetemp 4 s, contact 0.2 s) windows
    # (reference mr_gan.py:32).
    preprocess.run(raw_dir=str(raw_dir), out_dir=str(out_dir),
                   configs=[(4, 0.2)], prefix="", verbose=False)

    monkeypatch.setattr(tables, "PERCENTS_KFOLD", [100])
    ckpt = tmp_path / "sweep.jsonl"
    tables.gan_main([
        "-t", "1", "--data-dir", str(out_dir), "--modalities", "2",
        "--epochs", "2", "--seed", "0", "--no-mesh", "--strict",
        "--checkpoint", str(ckpt),
    ])
    out = capsys.readouterr().out
    assert "Average error:" in out

    recs = [json.loads(l) for l in ckpt.read_text().splitlines() if l.strip()]
    assert len(recs) == 1
    errors = np.asarray(recs[0]["result"], np.float64)
    assert errors.shape == (6,)  # 6 stratified folds actually trained
    assert np.all(np.isfinite(errors)) and np.all((0 <= errors) & (errors <= 1))


def test_run_writes_loadable_pickles(tmp_path):
    raw_dir = tmp_path / "data_raw"
    out_dir = tmp_path / "data_processed"
    raw_dir.mkdir()
    for material in ("plastic", "glass", "fabric", "metal", "wood", "ceramic"):
        for obj in range(2):
            raw = synthetic.generate_raw_file(
                seed=obj, material=material, pokes=2, record_s=2.0,
                impact_s=0.3)
            path = raw_dir / f"newdata_{material}_obj{obj}_batch0.pkl"
            with open(path, "wb") as f:
                pickle.dump(raw, f)

    preprocess.run(raw_dir=str(raw_dir), out_dir=str(out_dir),
                   configs=[(0.5, 0.05)], prefix="", verbose=False)

    path = out_dir / "processed_0.1sbefore_glass_times_0.50_0.05.pkl"
    assert os.path.exists(path)
    with open(path, "rb") as f:
        data = pickle.load(f)
    assert set(data.keys()) == {"glass_obj0", "glass_obj1"}
    obj = data["glass_obj0"]
    assert len(obj["force0"]) == 2
    assert np.asarray(obj["force0"][0]).shape == (50,)
    assert np.asarray(obj["contact"][0]).shape == (2400,)
    assert np.asarray(obj["temperature"][0]).shape == (50,)
