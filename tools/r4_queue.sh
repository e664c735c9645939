#!/bin/bash
# Round-4 prioritized hardware queue: FULL table regeneration under the
# round-4 recalibrated generator (force trigger/settle physics, temperature
# per-poke nuisance + faster surface tau, mic build/clutter/texture — every
# channel changed, so no round-3 cell remains valid), then the round's new
# evidence stages: the curve-shape parity GATE (VERDICT r3 next #2), the
# MEASURED roofline (next #4), the narrow-width fault repro (next #6, crashy
# — runs after everything that needs a healthy worker), and the DP-parity
# single-device side (next #8; the CPU-mesh side is a separate host job).
#
# Round-3 artifacts are parked under artifacts/r3/ only when their own regen
# starts; every stage is bounded and independently resumable (sweep CLIs
# checkpoint per cell).
set -ux -o pipefail
cd "$(dirname "$0")/.."
P="--synthetic --seed 0 --epochs 100 --no-mesh"
mkdir -p artifacts/r3
park () {
  for f in "$@"; do
    if [ -f "artifacts/$f" ] && [ ! -f "artifacts/r3/$f" ]; then
      mv "artifacts/$f" "artifacts/r3/$f"
    fi
  done
}

# 0. Clear the host core (single-core host): wait out any probe/test job.
for f in /tmp/probe.pid /tmp/pytest_r4.pid /tmp/cpuacc.pid; do
  if [ -f "$f" ]; then
    pid="$(cat "$f")"
    for _ in $(seq 120); do kill -0 "$pid" 2>/dev/null || break; sleep 10; done
    kill "$pid" 2>/dev/null || true
  fi
done
echo "QUEUE: host cleared"

# 1. Table 1 — the flagship label-efficiency curves (temperature span is the
#    round-4 headline fix).
park t1_sweep.jsonl t1_metrics.jsonl
timeout 3600 python mr_gan.py -t 1 $P \
    --checkpoint artifacts/t1_sweep.jsonl --metrics artifacts/t1_metrics.jsonl
echo "QUEUE: t1 rc=$?"

# 2. Table 5 — duration sweeps (force 0.5->1 s rise + mic shape fixes).
park t5_sweep.jsonl t5_metrics.jsonl
timeout 7200 python mr_gan.py -t 5 $P \
    --checkpoint artifacts/t5_sweep.jsonl --metrics artifacts/t5_metrics.jsonl
echo "QUEUE: t5 rc=$?"

# 3. First GATE + splice so partial evidence lands even if the round ends
#    mid-queue (idempotent; re-run at the end). The gate exit code is the
#    round-4 acceptance bar — log it loudly either way.
timeout 600 python tools/compare_published.py --gate | tee /tmp/compare_queue.log
echo "QUEUE: gate1 rc=$?"
timeout 600 python tools/summarize_regen.py --write
echo "QUEUE: summarize1 rc=$?"

# 4. Table 6 — the semi-supervised effect under the new generator.
park t6_sweep.jsonl t6_metrics.jsonl
timeout 1800 python mr_gan.py -t 6 $P \
    --checkpoint artifacts/t6_sweep.jsonl --metrics artifacts/t6_metrics.jsonl
echo "QUEUE: t6 rc=$?"

# 5. MLP + SVM Table 2 (the GAN-vs-baseline gap at 1% labels).
park t24_nn.jsonl t24_nn_metrics.jsonl
timeout 2400 python mr_nn.py -t 2 $P \
    --checkpoint artifacts/t24_nn.jsonl --metrics artifacts/t24_nn_metrics.jsonl
echo "QUEUE: t2nn rc=$?"
park t2_svm.jsonl t2_svm_metrics.jsonl
timeout 1200 python mr_svm.py -t 2 $P \
    --checkpoint artifacts/t2_svm.jsonl --metrics artifacts/t2_svm_metrics.jsonl
echo "QUEUE: t2svm rc=$?"

# 6. Table 3 LOO (ALL 10 cells — VERDICT r3 missing #2), then NN Table 4.
park t3_sweep.jsonl t3_metrics.jsonl
timeout 10800 python mr_gan.py -t 3 $P \
    --checkpoint artifacts/t3_sweep.jsonl --metrics artifacts/t3_metrics.jsonl
echo "QUEUE: t3 rc=$?"
timeout 7200 python mr_nn.py -t 2 4 $P \
    --checkpoint artifacts/t24_nn.jsonl --metrics artifacts/t24_nn_metrics.jsonl
echo "QUEUE: t4nn rc=$?"

# 7. Official bench line + legacy carry-layout A/B.
timeout 1800 python bench.py | tee /tmp/bench_queue.log
echo "QUEUE: bench rc=$?"
MRGAN_BENCH_FLAT_CARRY=0 timeout 1800 python bench.py | tee /tmp/bench_legacy.log
echo "QUEUE: bench-legacy rc=$?"

# 8. MEASURED roofline of the fused update (VERDICT r3 next #4): XLA cost
#    analysis of the compiled executable + timed wall on the chip.
timeout 1800 python tools/measure_roofline.py | tee /tmp/roofline_queue.log
echo "QUEUE: roofline rc=$?"

# 9. DP-parity single-device side on the chip (VERDICT r3 next #8). The
#    data-parallel side runs on the 10-virtual-device CPU mesh as a separate
#    host job (tools/dp_parity.py --side dp), then --compare.
timeout 1800 python tools/dp_parity.py --side single | tee /tmp/dp_single_queue.log
echo "QUEUE: dp-single rc=$?"

# 10. Figures from the fresh sweeps (guarded), final GATE to a DISTINCT log,
#     final STATUS splice.
if [ -f artifacts/t1_sweep.jsonl ] && [ -f artifacts/t5_sweep.jsonl ]; then
  cat artifacts/t1_sweep.jsonl artifacts/t5_sweep.jsonl > /tmp/t15_sweep.jsonl
  timeout 1800 python paperplotly.py --checkpoint /tmp/t15_sweep.jsonl \
      --out-dir artifacts --synthetic
  echo "QUEUE: figures rc=$?"
else
  echo "QUEUE: figures skipped (t1/t5 jsonl missing)"
fi
timeout 600 python tools/compare_published.py --gate | tee /tmp/compare_queue2.log
echo "QUEUE: gate2 rc=$?"
timeout 600 python tools/summarize_regen.py --write
echo "QUEUE: summarize2 rc=$?"

# 11. Narrow-width codegen-fault repro (VERDICT r3 next #6) — LAST of the
#     TPU stages: each crashing width kills a TPU worker subprocess by
#     design. Control width 1280 must pass; 640 documents the fault.
timeout 3600 python tools/repro_narrow_fault.py --dump-hlo \
    --out artifacts/narrow_fault | tee /tmp/narrow_fault_queue.log
echo "QUEUE: narrowfault rc=$?"

echo HWQUEUE_DONE
