"""CLI smoke tests: table drivers run end-to-end on tiny synthetic data with
the reference's stdout format, and sweep checkpointing resumes."""

import numpy as np
import pytest

from mrgan_tpu.cli import tables


@pytest.fixture()
def tiny_grids(monkeypatch):
    monkeypatch.setattr(tables, "PERCENTS_KFOLD", [100])
    monkeypatch.setattr(tables, "PERCENTS_LOO", [100])
    monkeypatch.setattr(tables, "UNLABELED_GRID", [0, 8])
    monkeypatch.setattr(tables, "FT_TIMES", [0.5])
    monkeypatch.setattr(tables, "C_TIMES", [0.05])
    monkeypatch.setattr(tables, "T1_MODALITIES", (0, 1))
    monkeypatch.setattr(tables, "PAIR_MODALITIES", (2,))
    monkeypatch.setattr(tables, "T5_FT_MODALITIES", (0,))


BASE = ["--synthetic", "--synthetic-pokes", "6", "--epochs", "2",
        "--seed", "0", "--no-mesh"]


def test_gan_table1_smoke(tiny_grids, capsys):
    tables.gan_main(["-t", "1"] + BASE)
    out = capsys.readouterr().out
    assert "Testing various amounts of labeled training data" in out
    assert "Average error:" in out
    assert "Test accuracy:" in out


def test_gan_table6_smoke(tiny_grids, capsys):
    tables.gan_main(["-t", "6"] + BASE)
    out = capsys.readouterr().out
    assert "Testing performance as quantity of unlabeled data increases" in out
    assert out.count("Percentage of training data unlabeled:") == 2


def test_gan_table3_loo_smoke(tiny_grids, capsys):
    tables.gan_main(["-t", "3"] + BASE)
    out = capsys.readouterr().out
    assert "Testing generalization with leave-one-object-out validation" in out
    assert "Average leave-one-object-out error:" in out
    # one result line per held-out object (6 materials x 12 objects)
    assert sum("Test error:" in ln for ln in out.splitlines()) == 72


def test_gan_table5_smoke(tiny_grids, capsys):
    tables.gan_main(["-t", "5"] + BASE)
    out = capsys.readouterr().out
    assert "Testing various lengths of contact time in training data" in out
    # one ft-duration cell for the patched modality + one contact-mic cell
    assert out.count("Length of training data:") == 2


def test_nn_table4_loo_smoke(tiny_grids, capsys):
    tables.nn_main(["-t", "4"] + BASE)
    out = capsys.readouterr().out
    assert "Average leave-one-object-out error:" in out


def test_nn_table2_smoke(tiny_grids, capsys):
    tables.nn_main(["-t", "2"] + BASE)
    out = capsys.readouterr().out
    assert "Average error:" in out


def test_svm_table2_smoke(tiny_grids, capsys):
    tables.svm_main(["-t", "2"] + BASE)
    out = capsys.readouterr().out
    assert "Average error:" in out
    errs = [float(line.split()[2]) for line in out.splitlines()
            if line.startswith("Average error:")]
    # synthetic classes are separable at 100% labels; SVM should do well
    assert np.mean(errs) < 0.5


def test_checkpoint_resume(tiny_grids, capsys, tmp_path):
    ckpt = str(tmp_path / "sweep.jsonl")
    args = ["-t", "2", "--checkpoint", ckpt] + BASE
    tables.nn_main(args)
    first = capsys.readouterr().out
    lines_before = open(ckpt).read().count("\n")
    assert lines_before > 0

    tables.nn_main(args)  # resumes: no retraining, same averages replayed
    second = capsys.readouterr().out
    assert open(ckpt).read().count("\n") == lines_before
    avg = [ln for ln in first.splitlines() if ln.startswith("Average error:")]
    avg2 = [ln for ln in second.splitlines() if ln.startswith("Average error:")]
    assert avg == avg2


def test_wganlpctsemi_cli_smoke(capsys, monkeypatch):
    # The variant grid-search CLI end-to-end on tiny synthetic data with the
    # cheapest algorithm (random forest; reference others/wganlpctsemi.py
    # -t 0 -a rf protocol shape).
    import wganlpctsemi

    monkeypatch.setattr(
        "sys.argv",
        ["wganlpctsemi.py", "-t", "0", "-a", "rf", "--synthetic",
         "--synthetic-pokes", "6", "--percents", "0.5", "--n-splits", "2"],
    )
    wganlpctsemi.main()
    out = capsys.readouterr().out
    assert "Accuracy" in out or "accuracy" in out
