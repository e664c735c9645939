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
    # per-table summary: 7 cells done, 3.5 min wall; pending tables marked
    assert "| Table 1 (GAN, 7 modalities × 7 %s) | 7 | 3.5 min |" in block
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
