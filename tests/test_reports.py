"""Plot-generation tests (reference paperplotly.py equivalents)."""

import json
import os

from mrgan_tpu.reports import plots


def test_published_curves_render(tmp_path):
    out1 = plots.plot_table1(str(tmp_path))
    out5 = plots.plot_table5(str(tmp_path))
    assert os.path.exists(out1) and os.path.getsize(out1) > 0
    assert os.path.exists(out5) and os.path.getsize(out5) > 0


def test_curves_from_checkpoint(tmp_path):
    ckpt = tmp_path / "sweep.jsonl"
    records = [
        {"cell": {"model": "gan", "table": 1, "modality": 2, "percent": 100},
         "result": [0.05, 0.06]},
        {"cell": {"model": "gan", "table": 1, "modality": 2, "percent": 4},
         "result": [0.2, 0.1]},
        {"cell": {"model": "gan", "table": 3, "modality": 2, "percent": 4},
         "result": [0.5]},  # different table: excluded
    ]
    with open(ckpt, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    curves = plots.curves_from_checkpoint(str(ckpt), table=1)
    assert list(curves) == ["Force, Temperature"]
    x, y = curves["Force, Temperature"]
    assert x == (4, 100)
    assert abs(y[0] - 85.0) < 1e-9 and abs(y[1] - 94.5) < 1e-9
    out = plots._line_chart(curves, "t", "x", "y",
                            str(tmp_path / "from_ckpt.html"))
    assert os.path.exists(out)


def test_sample_traces_from_synthetic(tmp_path):
    made = plots.plot_sample_traces(str(tmp_path), forcetemp_time=0.5,
                                    contactmic_time=0.05, synthetic_seed=1)
    assert len(made) == 3
    for p in made:
        assert os.path.exists(p) and os.path.getsize(p) > 0
