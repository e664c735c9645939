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


def test_gan_verbose_epoch_lines(tiny_grids, capsys):
    """-v prints the reference's per-epoch line (mr_gan.py:226-227 format),
    including the per-epoch test pass."""
    import re

    tables.gan_main(["-t", "1", "--modalities", "2"] + BASE + ["-v"])
    out = capsys.readouterr().out
    pat = (r"Epoch 2, time = \d+s, loss labeled = -?\d+\.\d{4}, "
           r"loss unlabeled = -?\d+\.\d{4}, train error = \d+\.\d{4}, "
           r"test error = \d+\.\d{4}")
    assert re.search(pat, out), out[-2000:]
    # per-epoch lines for each of the 6 folds, 2 epochs each
    assert len(re.findall(r"^Epoch \d+, time", out, re.M)) == 12


def test_mr_gan_function_api():
    """Reference function API: mr_gan(X, y) with the internal stratified
    split (mr_gan.py:87-88)."""
    import mr_gan as mr_gan_mod
    from mrgan_tpu.train import gan as gan_lib

    rng = np.random.RandomState(0)
    y = np.tile(np.arange(6, dtype=np.int32), 300)
    centers = rng.randn(6, 24) * 3
    x = (centers[y] + rng.randn(1800, 24)).astype(np.float32)
    cfg = gan_lib.GanConfig(noise_size=8, batch_size=10, epochs=2)
    err = mr_gan_mod.mr_gan(x, y, percentlabeled=10, seed=3, cfg=cfg)
    assert isinstance(err, float)
    assert 0.0 <= err <= 1.0

    # explicit trainTestSets path
    err2 = mr_gan_mod.mr_gan(
        None, None, percentlabeled=10, seed=3, cfg=cfg,
        trainTestSets=(x[:1200], x[1200:], y[:1200], y[1200:]))
    assert 0.0 <= err2 <= 1.0


def test_cell_fault_retries_once_then_records(tiny_grids, capsys):
    """Backend-fault policy: retry once with halved launch budget, then NaN +
    end-of-run summary; the sweep continues."""
    from mrgan_tpu.train import protocol as proto

    calls = {"n": 0, "budgets": []}

    def boom(*a, **kw):
        calls["n"] += 1
        calls["budgets"].append(proto.FOLD_LAUNCH_BYTE_BUDGET)
        raise RuntimeError("simulated worker crash")

    orig = tables.protocol.run_gan_cell
    tables.protocol.run_gan_cell = boom
    try:
        tables.gan_main(["-t", "1", "--modalities", "2"] + BASE)
    finally:
        tables.protocol.run_gan_cell = orig
    out = capsys.readouterr().out
    assert calls["n"] == 2  # original + one retry
    assert calls["budgets"][1] == calls["budgets"][0] / 2
    assert proto.FOLD_LAUNCH_BYTE_BUDGET == calls["budgets"][0]  # restored
    assert "retrying once with halved launch budget" in out
    assert "1 sweep section(s) FAILED" in out
    assert "nan" in out.lower()


def test_cell_fault_retry_succeeds(tiny_grids, capsys):
    from mrgan_tpu.train import protocol as proto

    calls = {"n": 0}
    orig = tables.protocol.run_gan_cell

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated worker crash")
        return orig(*a, **kw)

    tables.protocol.run_gan_cell = flaky
    try:
        tables.gan_main(["-t", "1", "--modalities", "2"] + BASE)
    finally:
        tables.protocol.run_gan_cell = orig
    out = capsys.readouterr().out
    assert calls["n"] == 2
    assert "FAILED" not in out
    assert "Average error:" in out
    assert proto.FOLD_LAUNCH_BYTE_BUDGET > 1e9  # restored


def test_cell_programming_error_propagates(tiny_grids):
    def bug(*a, **kw):
        raise TypeError("bad kwarg")

    orig = tables.protocol.run_gan_cell
    tables.protocol.run_gan_cell = bug
    try:
        with pytest.raises(TypeError):
            tables.gan_main(["-t", "1", "--modalities", "2"] + BASE)
    finally:
        tables.protocol.run_gan_cell = orig


def test_cell_strict_propagates_backend_fault(tiny_grids):
    def boom(*a, **kw):
        raise RuntimeError("simulated worker crash")

    orig = tables.protocol.run_gan_cell
    tables.protocol.run_gan_cell = boom
    try:
        with pytest.raises(RuntimeError):
            tables.gan_main(["-t", "1", "--modalities", "2", "--strict"]
                            + BASE)
    finally:
        tables.protocol.run_gan_cell = orig


def test_wganlpctsemi_ganlstm_cli_smoke(capsys, monkeypatch):
    """`wganlpctsemi.py -a ganlstm` runs a fold end-to-end (VERDICT r1 #7).
    Tiny blobs + 3 epochs keep the biLSTM scan CPU-fast; the algorithm's
    learning behavior is covered in test_variants."""
    import wganlpctsemi
    from mrgan_tpu.data import mreo
    from mrgan_tpu.variants import wgan

    rng = np.random.RandomState(0)
    y = np.tile(np.arange(6, dtype=np.int32), 20)
    x = (rng.randn(6, 16)[y] * 3 + rng.randn(120, 16)).astype(np.float32)
    monkeypatch.setattr(mreo, "load_features", lambda **kw: (x, y))
    orig_cfg = wgan.ganlstm_config
    monkeypatch.setattr(
        wgan, "ganlstm_config",
        lambda **kw: orig_cfg(**{**kw, "epochs": 3, "batch_size": 16,
                                 "pad_multiple": 1}))
    monkeypatch.setattr(
        "sys.argv",
        ["wganlpctsemi.py", "-t", "0", "-a", "ganlstm", "--synthetic",
         "--percents", "0.5", "--n-splits", "2"])
    wganlpctsemi.main()
    out = capsys.readouterr().out
    assert "Training with a GAN biLSTM" in out
    assert "Average accuracy:" in out


def test_wgan_grid_lumini_test0_smoke(capsys, tmp_path):
    """--dataset lumini runs the spectrometer grid (exposure x dlp) through
    test 0 end-to-end on a generated tiny dataset (wganlpctsemi.py:659-683)."""
    from mrgan_tpu.cli import wgan_grid

    wgan_grid.main(["-t", "0", "-a", "svm", "--dataset", "lumini",
                    "--synthetic", "--synthetic-objects", "2",
                    "--synthetic-samples", "3", "--samples", "3",
                    "--exposures", "100", "--dlp", "deriv1", "none",
                    "--n-splits", "2", "--percents", "1.0",
                    "--lumini-dir", str(tmp_path / "lumini")])
    out = capsys.readouterr().out
    assert "Training with an SVM" in out
    assert "Parameters: lumini 100 deriv1" in out
    assert "Parameters: lumini 100 None" in out
    assert "Best score:" in out


def test_wgan_grid_lumini_test2_loo_smoke(capsys, tmp_path):
    """Leave-one-object-out (test 2) over the spectrometer objects."""
    from mrgan_tpu.cli import wgan_grid

    wgan_grid.main(["-t", "2", "-a", "svm", "--dataset", "lumini",
                    "--synthetic", "--synthetic-objects", "2",
                    "--synthetic-samples", "3", "--samples", "3",
                    "--exposures", "100", "--dlp", "none",
                    "--percents", "1.0",
                    "--lumini-dir", str(tmp_path / "lumini")])
    out = capsys.readouterr().out
    assert "Parameters: lumini 100 None" in out
    assert out.count("Test accuracy:") == 12  # 6 materials x 2 objects
    assert "Average leave-one-object-out accuracy:" in out


def test_wgan_grid_scio_test0_smoke(capsys, tmp_path):
    """--dataset scio sweeps spectrum/spectrum_raw x dlp through test 0
    (the reference's SCiO grid shape, wganlpctsemi.py:661-677)."""
    from mrgan_tpu.cli import wgan_grid

    wgan_grid.main(["-t", "0", "-a", "svm", "--dataset", "scio",
                    "--synthetic", "--synthetic-objects", "2",
                    "--synthetic-samples", "3", "--samples", "3",
                    "--spectrum-raw", "spectrum", "spectrum_raw",
                    "--dlp", "deriv1", "--n-splits", "2",
                    "--percents", "1.0",
                    "--scio-dir", str(tmp_path / "scio")])
    out = capsys.readouterr().out
    assert "Parameters: scio spectrum deriv1" in out
    assert "Parameters: scio spectrum_raw deriv1" in out
    assert "Best score:" in out
