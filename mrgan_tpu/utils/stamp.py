"""Provenance stamps for sweep artifacts.

Round 4's evidence was invalidated by silently comparing sweep cells
produced under different synthetic-generator calibrations (VERDICT r4
weak #4: the GAN-vs-MLP headline gap mixed round-4 GAN cells with round-3
MLP cells). Every checkpointed cell therefore carries a stamp

    {"generator": <data.synthetic.GENERATOR_VERSION or "real">,
     "git": <short sha>, "round": <MRGAN_ROUND env, if set>}

and the comparison tools (tools/compare_published.py,
tools/summarize_regen.py) hard-refuse to evaluate a mixed-generation set.
"""

import os
import subprocess


def _git_sha():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001 — stamps must never break a sweep
        return "unknown"


def current(synthetic):
    """The provenance stamp for cells produced by this process.

    ``synthetic``: True when the sweep runs on the synthetic MREO generator
    (the stamp then pins the generator calibration version), False when it
    reads real processed pickles.
    """
    from ..data import synthetic as synth

    stamp = {
        "generator": synth.GENERATOR_VERSION if synthetic else "real",
        "git": _git_sha(),
    }
    rnd = os.environ.get("MRGAN_ROUND")
    if rnd:
        stamp["round"] = rnd
    return stamp


def generator_of(record):
    """The generator version a checkpoint JSONL record was produced under
    ("unstamped" for pre-round-5 artifacts)."""
    return (record.get("stamp") or {}).get("generator", "unstamped")
