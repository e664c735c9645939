"""Tests for the unattended operational tools (tools/).

tools/summarize_regen.py is the hardware queue's LAST stage: it splices the
round's hardware evidence into STATUS.md with nobody watching, so its parsing
and its splice (idempotency, placeholder replacement, surrounding text
preserved) are pinned here against synthetic artifacts.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "summarize_regen.py")


def _write_jsonl(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


@pytest.fixture
def fake_artifacts(tmp_path):
    art = tmp_path / "artifacts"
    art.mkdir()
    # Table 1: modality 2 (Force, Temperature) at the full percent grid,
    # accuracy rising with labels.
    t1 = [
        {"cell": {"model": "gan", "table": 1, "modality": 2, "percent": p},
         "result": [0.30 - 0.002 * p + 0.001 * i for i in range(6)]}
        for p in (1, 2, 4, 8, 16, 50, 100)
    ]
    _write_jsonl(art / "t1_sweep.jsonl", t1)
    _write_jsonl(
        art / "t1_metrics.jsonl",
        [{"event": "cell", "wall_s": 30.0}] * len(t1)
        + [{"event": "start"}],   # non-cell events must be ignored
    )
    # Table 6: the semi-supervised effect (error falls as unlabeled grows).
    t6 = [
        {"cell": {"model": "gan", "table": 6, "modality": 2, "percent": 4,
                  "percent_unlabeled": u},
         "result": [0.20 - 0.0005 * u]}
        for u in (0, 32, 96)
    ]
    _write_jsonl(art / "t6_sweep.jsonl", t6)
    # Scaling curve with one crashed width (the known wide-launch fault).
    _write_jsonl(art / "scaling_curve.jsonl", [
        {"width": 1, "updates_per_s": 2900.0, "updates_per_s_per_cell": 2900.0},
        {"width": 6, "updates_per_s": 3400.0, "updates_per_s_per_cell": 567.0},
        {"width": 12, "crashed": True, "tail": "worker crash"},
    ])
    return art


def test_summarize_build_sections(fake_artifacts):
    sys.path.insert(0, REPO)
    from tools import summarize_regen

    block = summarize_regen.build(str(fake_artifacts))
    # per-table summary: 7 of the 49-cell grid present -> must self-announce
    # as incomplete (VERDICT r3 weak #2: a partial Table 3 read as complete)
    assert ("| Table 1 (GAN, 7 modalities × 7 %s) | **7/49 INCOMPLETE** "
            "| 3.5 min |") in block
    assert "pending" in block  # t3/t5 etc. have no artifacts
    # curve-shape diagnostics for the one modality present
    assert "Table 1 accuracy" in block
    row = next(l for l in block.splitlines()
               if l.startswith("| Force, Temperature |"))
    # rho vs the published curve must be +1.00 for a monotone rising curve
    assert "+1.00" in row
    # semi-supervised effect line spans the unlabeled extremes
    assert "80.0 % (unlabeled 0 %) → 84.8 % (unlabeled 96 %)" in block
    # scaling table includes healthy widths and flags the crashed one
    assert "| 6 | 3400 | 567 |" in block
    assert "(widths [12] crashed the worker" in block


def test_summarize_complete_grid_prints_bare_count(tmp_path):
    sys.path.insert(0, REPO)
    from tools import summarize_regen

    art = tmp_path / "artifacts"
    art.mkdir()
    t6 = [
        {"cell": {"model": "gan", "table": 6, "modality": m, "percent": 4,
                  "percent_unlabeled": u},
         "result": [0.20 - 0.0005 * u]}
        for m in (2, 5) for u in (0, 8, 16, 32, 48, 64, 96)
    ]
    _write_jsonl(art / "t6_sweep.jsonl", t6)
    block = summarize_regen.build(str(art))
    assert "| Table 6 (GAN, unlabeled sweep) | 14 | — |" in block
    assert "INCOMPLETE" not in block


def test_summarize_splice_idempotent(fake_artifacts, tmp_path):
    status = tmp_path / "STATUS.md"
    status.write_text(
        "# STATUS\n\nhead text\n\n<!-- R2_REGEN_RESULTS -->\n"
        "*(Placeholder)*\n<!-- /R2_REGEN_RESULTS -->\n\ntail text\n")
    cmd = [sys.executable, TOOL, "--artifacts", str(fake_artifacts),
           "--write", "--status", str(status)]
    subprocess.run(cmd, check=True, capture_output=True, cwd=REPO,
                   timeout=120)
    once = status.read_text()
    assert "Placeholder" not in once
    assert once.startswith("# STATUS\n\nhead text\n")
    assert once.endswith("\ntail text\n")
    assert "Table 1 accuracy" in once
    subprocess.run(cmd, check=True, capture_output=True, cwd=REPO,
                   timeout=120)
    assert status.read_text() == once


def test_summarize_write_requires_marker(fake_artifacts, tmp_path):
    status = tmp_path / "STATUS.md"
    status.write_text("no markers here\n")
    cmd = [sys.executable, TOOL, "--artifacts", str(fake_artifacts),
           "--write", "--status", str(status)]
    proc = subprocess.run(cmd, capture_output=True, cwd=REPO, timeout=120)
    assert proc.returncode != 0
    assert status.read_text() == "no markers here\n"  # untouched on failure


GATE_TOOL = os.path.join(REPO, "tools", "compare_published.py")

# the published Table-1 accuracy grids (reference paperplotly.py:17-23),
# keyed by modality index like the sweep checkpoints. Imported from the
# single source of truth (reports.plots) so the gate tests exercise the TRUE
# published curves — ADVICE r4: a stale local copy sat just inside the gate
# thresholds and quietly weakened these tests.
from mrgan_tpu.reports import plots as _plots  # noqa: E402

_PUB_T1 = {m: tuple(_plots.TABLE1[name])
           for m, name in _plots.MODALITY_CURVES.items()}
_T1_PERCENTS = tuple(_plots.TABLE1_X)


def _t1_artifacts(tmp_path, transform=lambda m, p, acc: acc):
    art = tmp_path / "artifacts"
    art.mkdir(exist_ok=True)
    recs = []
    for m, accs in _PUB_T1.items():
        for p, acc in zip(_T1_PERCENTS, accs):
            a = transform(m, p, acc)
            recs.append({"cell": {"model": "gan", "table": 1,
                                  "modality": m, "percent": p},
                         "result": [1.0 - a / 100.0]})
    _write_jsonl(art / "t1_sweep.jsonl", recs)
    return art


def _run_gate(art):
    return subprocess.run(
        [sys.executable, GATE_TOOL, "--artifacts", str(art), "--gate"],
        capture_output=True, text=True)


def test_parity_gate_green_on_published_curves(tmp_path):
    """The curve-shape gate (VERDICT r3 next #2) passes when the regenerated
    Table-1 curves equal the published ones."""
    res = _run_gate(_t1_artifacts(tmp_path))
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PASS" in res.stdout


def test_parity_gate_catches_saturation_and_bias(tmp_path):
    """A saturated curve family (the round-2 temperature failure: span ~5,
    rho negative) and a global positive bias (the round-3 failure) must each
    fail the gate with a pointed message."""
    # temperature flattens at 80% (saturation)
    art = _t1_artifacts(
        tmp_path, lambda m, p, acc: 80.0 + 0.01 * p if m == 1 else acc)
    res = _run_gate(art)
    assert res.returncode == 1
    assert "table1/Temperature" in res.stdout and "span" in res.stdout

    # every curve +4 points (global easy bias); shapes all still correct
    art = _t1_artifacts(tmp_path, lambda m, p, acc: min(acc + 4.0, 99.9))
    res = _run_gate(art)
    assert res.returncode == 1
    assert "mean signed delta" in res.stdout


def test_parity_gate_flags_missing_family(tmp_path):
    """An incomplete regen (round 3's 8-of-10 Table 3 analog: missing cells)
    cannot silently pass: a family with no regenerated curve is a
    violation."""
    art = _t1_artifacts(tmp_path)
    # drop every Force cell
    lines = [l for l in (art / "t1_sweep.jsonl").read_text().splitlines()
             if '"modality": 0' not in l]
    (art / "t1_sweep.jsonl").write_text("\n".join(lines) + "\n")
    res = _run_gate(art)
    assert res.returncode == 1
    assert "no regenerated curve" in res.stdout


@pytest.mark.slow
def test_parity_gate_on_reduced_sweep(tmp_path):
    """End-to-end plumbing: a real (tiny) Table-1 sweep through the
    production CLI writes a checkpoint the gate can evaluate. The reduced
    sweep is far from the published accuracies, so the gate must FAIL with
    per-family diagnostics — proving a bad regen cannot slip through the
    hardware queue's final stage."""
    ckpt = tmp_path / "t1_sweep.jsonl"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "mr_gan.py"), "--tables", "1",
         "--synthetic", "--synthetic-pokes", "6", "--epochs", "2",
         "--seed", "0", "--no-mesh", "--checkpoint", str(ckpt)],
        check=True, capture_output=True, text=True, cwd=REPO)
    res = _run_gate(tmp_path)
    assert res.returncode == 1
    # all 7 Table-1 families were swept and evaluated (not missing)
    assert "no regenerated curve" not in res.stdout
    assert "FAIL" in res.stdout


def test_mixed_generation_stamps_refused(tmp_path):
    """VERDICT r4 weak #4: the gate must hard-refuse artifact sets that mix
    generator versions (exit 2, before any curve evaluation)."""
    art = _t1_artifacts(tmp_path)
    lines = (art / "t1_sweep.jsonl").read_text().splitlines()
    recs = [json.loads(l) for l in lines]
    half = len(recs) // 2
    for i, r in enumerate(recs):
        r["stamp"] = {"generator": "vA" if i < half else "vB", "git": "x"}
    (art / "t1_sweep.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    res = _run_gate(art)
    assert res.returncode == 2
    assert "REFUSED" in res.stdout
    # uniform stamps pass the check (and then run the gate normally)
    for r in recs:
        r["stamp"] = {"generator": "vA", "git": "x"}
    (art / "t1_sweep.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    res = _run_gate(art)
    assert res.returncode == 0, res.stdout
    assert "vA" in res.stdout  # the gate names the stamp it validated


def test_checkpoint_records_and_reloads_stamps(tmp_path):
    from mrgan_tpu.utils import checkpoint as ckpt_lib

    path = tmp_path / "sweep.jsonl"
    ck = ckpt_lib.SweepCheckpoint(str(path))
    ck.record([0.1, 0.2], stamp={"generator": "vX", "git": "abc"},
              model="gan", table=1, modality=0, percent=1)
    ck.record([0.3], model="gan", table=1, modality=0, percent=2)  # unstamped
    re = ckpt_lib.SweepCheckpoint(str(path))
    assert re.get(model="gan", table=1, modality=0, percent=1) == [0.1, 0.2]
    assert re.generators == {"vX", "unstamped"}
    assert ckpt_lib.file_generators(str(path)) == {"vX", "unstamped"}


def test_require_processed_forbids_synthetic_fallback(tmp_path, monkeypatch):
    """MRGAN_REQUIRE_PROCESSED=1 (set by the rehearsal sweep) must raise on
    missing pickles instead of silently generating synthetic data (round-5
    finding: absent-config rehearsal cells masqueraded as real-file runs)."""
    from mrgan_tpu.data import mreo

    monkeypatch.setenv("MRGAN_REQUIRE_PROCESSED", "1")
    with pytest.raises(FileNotFoundError, match="forbids"):
        mreo.load_features(modalities=0, forcetemp_time=0.5,
                           contactmic_time=0.05, data_dir=str(tmp_path))
    # an explicit synthetic request is still honored
    x, y = mreo.load_features(
        modalities=0, forcetemp_time=0.5, contactmic_time=0.05,
        data_dir=str(tmp_path), synthetic_seed=0,
        synthetic_kwargs=dict(pokes_per_object=2, objects_per_material=2))
    assert len(x) == len(y) == 6 * 2 * 2
