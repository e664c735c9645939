#!/usr/bin/env python3
"""Compose the hardware-regeneration results section for STATUS.md.

After `tools/hardware_queue.sh` finishes (table regen + scaling curve +
bench + shadow check + serve bench), this tool reads every artifact the
queue produced and prints one markdown block summarizing the round's
hardware evidence: per-table headline accuracies and wall clock, curve-shape
diagnostics vs the published numbers (reference paperplotly.py:16-23,49-54),
the bench line(s), the measured sweep-scaling curve, and serving latency.

With --write, the block is spliced into STATUS.md between the
`<!-- R2_REGEN_RESULTS -->` and `<!-- /R2_REGEN_RESULTS -->` markers
(the end marker is added if missing), so the regen lands in the docs the
moment the queue completes.

Usage: python tools/summarize_regen.py [--artifacts artifacts] [--write]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mrgan_tpu.reports import plots  # noqa: E402
from mrgan_tpu.utils import checkpoint as ckpt_lib  # noqa: E402

MARKER = "<!-- R2_REGEN_RESULTS -->"
END_MARKER = "<!-- /R2_REGEN_RESULTS -->"


def _read_jsonl(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _json_lines_from_log(path):
    """Extract JSON-object lines from a mixed stdout log (bench/serve)."""
    recs = []
    if not os.path.exists(path):
        return recs
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    recs.append(json.loads(line))
                except ValueError:
                    pass
    return recs


def _wall(metrics_path):
    cells = [r for r in _read_jsonl(metrics_path) if r.get("event") == "cell"]
    if not cells:
        return None, 0
    return sum(r.get("wall_s", 0.0) for r in cells) / 60.0, len(cells)


def _spearman(a, b):
    ra, rb = (np.argsort(np.argsort(np.asarray(v))) for v in (a, b))
    ca, cb = ra - ra.mean(), rb - rb.mean()
    d = np.sqrt((ca ** 2).sum() * (cb ** 2).sum())
    return float((ca * cb).sum() / d) if d else float("nan")


def _curve_rows(sweep_path, table, published, pub_x):
    """Markdown rows: one per modality curve, with shape diagnostics."""
    rows = []
    if not os.path.exists(sweep_path):
        return rows
    curves = plots.curves_from_checkpoint(sweep_path, table=table)
    for name, pub in published.items():
        got = curves.get(name)
        if not got:
            continue
        x, acc = got
        pub_map = dict(zip(pub_x(name), pub))
        pairs = [(aa, pub_map[xx]) for xx, aa in zip(x, acc) if xx in pub_map]
        if not pairs:
            continue
        accs, pubs = zip(*pairs)
        rows.append(
            f"| {name} | "
            + " / ".join(f"{a:.1f}" for a in accs)
            + f" | {max(accs) - min(accs):.1f} (pub {max(pubs) - min(pubs):.1f})"
            + f" | {_spearman(accs, pubs):+.2f} |")
    return rows


def _fmt_min(m):
    return "—" if m is None else f"{m:.1f} min"


def check_stamps(artifacts):
    """Refuse to summarize a mixed-generation artifact set (VERDICT r4
    weak #4): all present sweep files must share one generator stamp.
    Returns the version string (or None if no artifacts exist)."""
    files = ["t1_sweep.jsonl", "t3_sweep.jsonl", "t5_sweep.jsonl",
             "t6_sweep.jsonl", "t24_nn.jsonl", "t2_svm.jsonl"]
    per_file = {f: ckpt_lib.file_generators(os.path.join(artifacts, f))
                for f in files}
    per_file = {f: g for f, g in per_file.items() if g}
    all_gens = set().union(*per_file.values()) if per_file else set()
    if len(all_gens) > 1:
        for f, gens in sorted(per_file.items()):
            print(f"  {f}: {', '.join(sorted(gens))}", file=sys.stderr)
        sys.exit(f"REFUSED: artifacts mix generator versions "
                 f"{sorted(all_gens)}; regenerate under one version before "
                 "summarizing")
    return next(iter(all_gens)) if all_gens else None


def build(artifacts):
    L = []
    generator = check_stamps(artifacts)
    if generator:
        L.append(f"(all sweep artifacts stamped generator **{generator}**)")
        L.append("")

    # --- per-table regen summary -------------------------------------
    # Expected cell counts are the full sweep grids (cli/tables.py; the
    # reference protocols): a short count is printed as "n/N INCOMPLETE" so
    # a partial regen can never read as a finished one (VERDICT r3 weak #2 —
    # round 3 reported Table 3 complete at 8/10 cells).
    tables = [
        ("Table 1 (GAN, 7 modalities × 7 %s)", "t1_sweep", "t1_metrics", 49),
        ("Table 3 (GAN, LOO over 72 objects)", "t3_sweep", "t3_metrics", 10),
        ("Table 5 (GAN, duration sweep)", "t5_sweep", "t5_metrics", 28),
        ("Table 6 (GAN, unlabeled sweep)", "t6_sweep", "t6_metrics", 14),
        # 24 = table 2's 14 k-fold cells + table 4's 10 LOO cells (the
        # round-5 queue regenerates both; earlier rounds only ran table 2,
        # which is why this expectation read 14 before)
        ("Tables 2/4 (MLP baseline)", "t24_nn", "t24_nn_metrics", 24),
        ("Table 2 (SVM baseline)", "t2_svm", "t2_svm_metrics", 14),
    ]
    L += ["| Sweep | cells done | cell wall |", "|---|---|---|"]
    for label, sweep, metrics, expect in tables:
        n_cells = len(_read_jsonl(os.path.join(artifacts, f"{sweep}.jsonl")))
        wall, _ = _wall(os.path.join(artifacts, f"{metrics}.jsonl"))
        done = ("pending" if not n_cells
                else str(n_cells) if n_cells == expect
                else f"**{n_cells}/{expect} INCOMPLETE**")
        L.append(f"| {label} | {done} | {_fmt_min(wall)} |")

    # --- curve shapes vs published ------------------------------------
    t1_rows = _curve_rows(os.path.join(artifacts, "t1_sweep.jsonl"), 1,
                          plots.TABLE1, lambda n: plots.TABLE1_X)
    if t1_rows:
        L += ["", "Table 1 accuracy at {1,2,4,8,16,50,100}% labels "
              "(span + Spearman rho vs published curve):", "",
              "| curve | regenerated % | span | rho |", "|---|---|---|---|"]
        L += t1_rows
    t5_rows = _curve_rows(
        os.path.join(artifacts, "t5_sweep.jsonl"), 5, plots.TABLE5,
        lambda n: (plots.TABLE5_X_CONTACT if n == "Contact mic"
                   else plots.TABLE5_X))
    if t5_rows:
        L += ["", "Table 5 accuracy vs window duration:", "",
              "| curve | regenerated % | span | rho |", "|---|---|---|---|"]
        L += t5_rows

    # --- semi-supervised effect ---------------------------------------
    t6 = _read_jsonl(os.path.join(artifacts, "t6_sweep.jsonl"))
    if t6:
        by_mod = {}
        for r in t6:
            c = r["cell"]
            acc = 100.0 * (1.0 - float(np.mean(r["result"])))
            by_mod.setdefault(c["modality"], {})[c["percent_unlabeled"]] = acc
        L.append("")
        for mod, pts in sorted(by_mod.items()):
            lo, hi = min(pts), max(pts)
            L.append(f"- Table 6 semi-supervised effect, modality {mod}: "
                     f"{pts[lo]:.1f} % (unlabeled {lo} %) → {pts[hi]:.1f} % "
                     f"(unlabeled {hi} %) at fixed 4 % labels")

    t1 = os.path.join(artifacts, "t1_sweep.jsonl")
    t24 = os.path.join(artifacts, "t24_nn.jsonl")
    if os.path.exists(t1) and os.path.exists(t24):
        gan_c = plots.curves_from_checkpoint(t1, table=1)
        mlp_c = plots.curves_from_checkpoint(t24, table=2)
        gaps = []
        for name in sorted(mlp_c):
            g = dict(zip(*gan_c[name])).get(1) if name in gan_c else None
            m = dict(zip(*mlp_c[name])).get(1)
            if g is not None and m is not None:
                gaps.append(f"{name}: GAN {g:.1f} vs MLP {m:.1f} "
                            f"({g - m:+.1f})")
        if gaps:
            L += ["", "GAN-vs-MLP @1 % labels (the paper's core claim): "
                  + "; ".join(gaps)]

    # --- bench + carry-layout A/B ---------------------------------------
    # bench_queue.log is the official line (flat carry is the default since
    # round 3); bench_legacy.log is the A/B with the legacy pytree carry
    # (MRGAN_BENCH_FLAT_CARRY=0). The pre-round-3 /tmp/bench_flat.log (flat
    # as the opt-in side) is only used if no legacy log exists.
    bench = _json_lines_from_log("/tmp/bench_queue.log")
    legacy = _json_lines_from_log("/tmp/bench_legacy.log")
    flat = _json_lines_from_log("/tmp/bench_flat.log")
    if bench:
        b = bench[-1]
        L += ["", f"- bench.py: **{b['value']:.0f} {b['unit']}** "
              f"({b['vs_baseline']:.1f}× baseline)"]
        mel = (b.get("extra") or {}).get("mel_frontend_examples_per_sec")
        if mel:
            L.append(f"- mel frontend through production dispatch: "
                     f"**{mel:.0f} {b['extra']['mel_frontend_unit']}**")
    if legacy:
        b = legacy[-1]
        L.append(f"- legacy scan-carry layout A/B (MRGAN_BENCH_FLAT_CARRY=0): "
                 f"{b['value']:.0f} {b['unit']} "
                 f"({b['vs_baseline']:.1f}× baseline)")
    elif flat:
        b = flat[-1]
        L.append(f"- flat scan-carry A/B (MRGAN_BENCH_FLAT_CARRY=1): "
                 f"{b['value']:.0f} {b['unit']} "
                 f"({b['vs_baseline']:.1f}× baseline)")

    # --- measured sweep scaling ---------------------------------------
    scal = _read_jsonl(os.path.join(artifacts, "scaling_curve.jsonl"))
    ok = [r for r in scal if not r.get("crashed")]
    if ok:
        L += ["", "Measured sweep-axis scaling on ONE chip "
              "(stacked same-shape cells per launch):", "",
              "| vmap width | aggregate updates/s | per-cell updates/s |",
              "|---|---|---|"]
        for r in ok:
            L.append(f"| {r['width']} | {r['updates_per_s']:.0f} | "
                     f"{r['updates_per_s_per_cell']:.0f} |")
        crashed = [r["width"] for r in scal if r.get("crashed")]
        if crashed:
            L.append("")
            L.append(f"(widths {crashed} crashed the worker — the known "
                     "wide-launch fault shape; excluded)")

    # --- serving --------------------------------------------------------
    serve = [r for r in _json_lines_from_log("/tmp/serve_bench.log")
             if r.get("metric") == "serve_classify_latency_ms"]
    if serve:
        one = min(serve, key=lambda r: r["batch"])
        big = max(serve, key=lambda r: r["batch"])
        L += ["", f"- serving: p50 {one['p50']:.2f} ms @batch {one['batch']} "
              f"→ {big['throughput_ex_per_s']:.0f} ex/s @batch {big['batch']} "
              f"({big['platform']})"]

    return "\n".join(L) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--write", action="store_true",
                    help="splice the block into STATUS.md between markers")
    ap.add_argument("--status", default=None,
                    help="STATUS file to splice into (default: repo STATUS.md)")
    args = ap.parse_args()

    block = build(args.artifacts)
    print(block)

    if args.write:
        path = args.status or os.path.join(
            os.path.dirname(__file__), "..", "STATUS.md")
        with open(path) as f:
            text = f.read()
        if MARKER not in text:
            sys.exit(f"STATUS.md has no {MARKER} marker")
        head, rest = text.split(MARKER, 1)
        tail = rest.split(END_MARKER, 1)[1] if END_MARKER in rest else rest
        with open(path, "w") as f:
            f.write(head + MARKER + "\n" + block + END_MARKER + tail)
        print("(spliced into STATUS.md)", file=sys.stderr)


if __name__ == "__main__":
    main()
