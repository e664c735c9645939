"""Real-dataset dry dock: the distributed MREO pickles were written by
python 2.7 (reference README.md:41-47), so the loaders' latin1/byte-key
contract must be proven against genuinely py2-SHAPED streams, not py3
re-pickles. data.py2pickle fabricates those streams; these tests pin

1. the byte-level stream shape (BINSTRING opcodes, py2 numpy module paths,
   failure under py3's default ASCII decode — the real files' behavior);
2. the production processed-pickle loader (mreo.load_features) reading py2
   streams bitwise-identically to py3 ones (mr_gan.py:32-33 surface);
3. the full offline slice against py2 RAW pickles: processdata ->
   processed pickles -> dataset -> one GAN cell (processdata.py:19 ->
   mr_gan.py --tables path), all in CI on ragged per-object pokes.
"""

import pickle
import pickletools

import numpy as np
import pytest

from mrgan_tpu import MATERIALS
from mrgan_tpu.data import mreo, preprocess, py2pickle, synthetic


def _sample_processed_obj():
    rng = np.random.RandomState(0)
    return {
        "metal_bowl": {
            "temperature": [rng.randn(50).astype(np.float32) * 40 for _ in range(3)],
            "temperatureTime": [np.linspace(0, 0.5, 50)] * 3,
            "force0": [rng.randn(50).astype(np.float32) for _ in range(3)],
        }
    }


def test_stream_is_py2_shaped():
    buf = py2pickle.dumps_py2(_sample_processed_obj())
    ops = [(op.name, arg) for op, arg, _ in pickletools.genops(buf)]
    names = {n for n, _ in ops}
    # py2 str opcodes present; py3 unicode opcodes absent
    assert "SHORT_BINSTRING" in names or "BINSTRING" in names
    assert not any("BINUNICODE" in n for n in names)
    # protocol 2 (py2's highest)
    assert ("PROTO", 2) in ops
    # numpy globals under their py2-era module path
    globals_ = [arg for n, arg in ops if n == "GLOBAL"]
    assert any("numpy.core.multiarray" in g for g in globals_), globals_
    assert not any("numpy._core" in g for g in globals_), globals_


def test_ascii_load_fails_latin1_round_trips():
    obj = _sample_processed_obj()
    buf = py2pickle.dumps_py2(obj)
    # the real py2 files raise under py3's default ASCII decode — so must
    # the fabricated ones (float64/float32 buffers contain >0x7f bytes)
    with pytest.raises(UnicodeDecodeError):
        pickle.loads(buf)
    back = pickle.loads(buf, encoding="latin1")
    got = np.asarray(back["metal_bowl"]["temperature"])
    np.testing.assert_array_equal(
        got, np.asarray(obj["metal_bowl"]["temperature"]))
    assert isinstance(next(iter(back)), str)


def _write_processed(tmp_path, writer, ft=0.5, c=0.05):
    tmp_path.mkdir(parents=True, exist_ok=True)
    data = synthetic.generate_processed(
        seed=0, forcetemp_time=ft, contactmic_time=c,
        pokes_per_object=3, objects_per_material=2)
    for material in MATERIALS:
        writer(data[material],
               mreo.processed_path(str(tmp_path), material, ft, c))
    return str(tmp_path)


def test_production_loader_reads_py2_streams_identically(tmp_path):
    def py3_writer(obj, path):
        with open(path, "wb") as f:
            pickle.dump(obj, f, protocol=2)

    d2 = _write_processed(tmp_path / "py2", py2pickle.dump_py2)
    d3 = _write_processed(tmp_path / "py3", py3_writer)
    x2, y2 = mreo.load_features(modalities=2, forcetemp_time=0.5,
                                contactmic_time=0.05, data_dir=d2)
    x3, y3 = mreo.load_features(modalities=2, forcetemp_time=0.5,
                                contactmic_time=0.05, data_dir=d3)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x3))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))


def _raw_poke_streams(rng, impact, length_s):
    """One poke's ragged raw streams in collectdataPoke.py's save schema."""
    t_f = np.arange(0.0, length_s, 1.0 / 50.0) + rng.uniform(0, 0.01)
    force = 0.05 * rng.randn(len(t_f), 22)
    ramp = np.clip((t_f - impact) * 3.0, 0.0, 1.0)
    force[:, 3] += 4.0 * ramp
    force[:, 4] += 3.2 * ramp
    t_t = np.arange(0.0, length_s, 1.0 / 100.0)
    celsius = 55.0 - 6.0 * (1 - np.exp(-np.maximum(t_t - impact, 0) / 0.7))
    temp_raw = np.stack([500 + 5 * celsius, celsius], axis=1)
    t_c = np.arange(impact - 0.3, impact + 0.5, 1.0 / 8000.0)
    mic = 3.0 * rng.randn(len(t_c)) * np.exp(
        -np.abs(t_c - impact) * 20.0) * (t_c >= impact)
    return t_f, force, t_t, temp_raw, t_c, mic


def test_py2_raw_pickles_through_processdata_to_gan_cell(tmp_path):
    """processdata.py:19 reads data_raw/newdata_<material>*.pkl written by
    the py2 acquisition stack; drive those exact bytes through the full
    offline slice: window/resample -> processed pickles -> dataset() ->
    one (tiny) GAN cell, i.e. the mr_gan.py --tables data path."""
    raw_dir = tmp_path / "data_raw"
    out_dir = tmp_path / "data_processed"
    raw_dir.mkdir()
    rng = np.random.RandomState(7)
    for material in MATERIALS:
        pokes = 4
        raw = {k: [] for k in
               ("RGripRFingerTime", "RGripRFingerForce",
                "RGripRFingerPressure", "temperatureTime", "temperatureRaw",
                "contactmicTime", "contactmic", "collisionTime")}
        for p in range(pokes):
            impact = 1.0 + 0.1 * rng.rand()
            # ragged: every poke records a different stream length
            t_f, force, t_t, temp_raw, t_c, mic = _raw_poke_streams(
                rng, impact, 2.2 + 0.3 * p)
            raw["RGripRFingerTime"].append(t_f.tolist())
            raw["RGripRFingerForce"].append(force)
            raw["RGripRFingerPressure"].append(force / 0.0003 / 1000.0)
            raw["temperatureTime"].append(t_t.tolist())
            raw["temperatureRaw"].append(temp_raw)
            raw["contactmicTime"].append(t_c.tolist())
            raw["contactmic"].append(mic.tolist())
            raw["collisionTime"].append(float(impact))
        py2pickle.dump_py2(
            raw, str(raw_dir / ("newdata_%s_obj0_%dseqs.pkl"
                                % (material, pokes))))

    preprocess.run(str(raw_dir), str(out_dir), configs=[(0.5, 0.1)],
                   prefix="", verbose=False)
    assert mreo.have_processed(str(out_dir), 0.5, 0.1)

    x, y = mreo.load_features(modalities=2, forcetemp_time=0.5,
                              contactmic_time=0.1, data_dir=str(out_dir))
    x, y = np.asarray(x), np.asarray(y)
    assert x.shape == (24, 150)  # 6 materials x 4 pokes, 3 x 50 features
    assert np.all(np.isfinite(x))
    assert sorted(set(y.tolist())) == list(range(6))

    from mrgan_tpu.train import gan, protocol

    cfg = gan.GanConfig(noise_size=8, batch_size=6, epochs=2, pad_multiple=1)
    errs = np.asarray(protocol.run_gan_cell(
        x, y, percentlabeled=100, cfg=cfg, seed=0, n_splits=2, mesh=None))
    assert errs.shape == (2,)
    assert np.all((errs >= 0) & (errs <= 1))
