#!/bin/bash
# Round-5 evidence queue (VERDICT r4 next #1-#9).
#
# Discipline rules learned from round 4 (VERDICT r4 weak #2/#3, next #9):
# - runs only AFTER the calibration proxy loop converged (the generator
#   version this queue stamps is final for the round);
# - the perf stages (bench + legacy A/B + measured roofline) ran FIRST in
#   the round on an idle chip (artifacts/r5/, committed separately) — they
#   are NOT re-run mid-queue where sweeps would contaminate them;
# - ALL stale artifacts are parked+deleted UP FRONT in one block (ADVICE r4
#   #2: per-stage deletion let summarize splice mixed-generation evidence);
# - gate_splice after every sweep is stamp-checked: with every file fresh,
#   the summarize/gate tools refuse mixed-generation sets loudly;
# - the worker-crashing narrow-width repro stays LAST, after a final bench
#   guard, and the queue prints HWQUEUE_DONE so the round snapshot can
#   verify the chip is idle.
set -ux -o pipefail
cd "$(dirname "$0")/.."
export MRGAN_ROUND=5
P="--synthetic --seed 0 --epochs 100 --no-mesh"

# 0. Park the round-4 artifacts, then delete EVERYTHING this queue will
#    regenerate in one upfront block.
mkdir -p artifacts/r4
cp -n artifacts/t1_sweep.jsonl artifacts/t1_metrics.jsonl \
      artifacts/t3_sweep.jsonl artifacts/t3_metrics.jsonl \
      artifacts/t5_sweep.jsonl artifacts/t5_metrics.jsonl \
      artifacts/t6_sweep.jsonl artifacts/t6_metrics.jsonl \
      artifacts/t24_nn.jsonl artifacts/t24_nn_metrics.jsonl \
      artifacts/t2_svm.jsonl artifacts/t2_svm_metrics.jsonl \
      artifacts/r4/ 2>/dev/null || true
rm -f artifacts/t1_sweep.jsonl artifacts/t1_metrics.jsonl \
      artifacts/t3_sweep.jsonl artifacts/t3_metrics.jsonl \
      artifacts/t5_sweep.jsonl artifacts/t5_metrics.jsonl \
      artifacts/t6_sweep.jsonl artifacts/t6_metrics.jsonl \
      artifacts/t24_nn.jsonl artifacts/t24_nn_metrics.jsonl \
      artifacts/t2_svm.jsonl artifacts/t2_svm_metrics.jsonl

gate_splice () {
  # --gate exits nonzero on missing families mid-queue; that is expected
  # until every sweep has landed — the FINAL gate is the one that counts.
  timeout 600 python tools/compare_published.py --gate | tee "/tmp/compare_$1.log" || true
  echo "QUEUE: gate($1) done"
  timeout 600 python tools/summarize_regen.py --write || true
  echo "QUEUE: summarize($1) done"
}

# 1. Table 1 — the flagship label-efficiency curves.
timeout 5400 python mr_gan.py -t 1 $P \
    --checkpoint artifacts/t1_sweep.jsonl --metrics artifacts/t1_metrics.jsonl
echo "QUEUE: t1 rc=$?"
gate_splice t1

# 2. Table 5 — duration sweeps.
timeout 7200 python mr_gan.py -t 5 $P \
    --checkpoint artifacts/t5_sweep.jsonl --metrics artifacts/t5_metrics.jsonl
echo "QUEUE: t5 rc=$?"
gate_splice t5

# 3. Table 3 LOO — ALL 10 cells (two rounds of incompleteness end here).
timeout 10800 python mr_gan.py -t 3 $P \
    --checkpoint artifacts/t3_sweep.jsonl --metrics artifacts/t3_metrics.jsonl
echo "QUEUE: t3 rc=$?"

# 4. Table 6 — the semi-supervised effect.
timeout 1800 python mr_gan.py -t 6 $P \
    --checkpoint artifacts/t6_sweep.jsonl --metrics artifacts/t6_metrics.jsonl
echo "QUEUE: t6 rc=$?"

# 5. Baselines under the SAME generator (VERDICT r4 weak #4: the GAN-vs-MLP
#    gap must be computed on one dataset generation).
timeout 7200 python mr_nn.py -t 2 4 $P \
    --checkpoint artifacts/t24_nn.jsonl --metrics artifacts/t24_nn_metrics.jsonl
echo "QUEUE: t24nn rc=$?"
timeout 1200 python mr_svm.py -t 2 $P \
    --checkpoint artifacts/t2_svm.jsonl --metrics artifacts/t2_svm_metrics.jsonl
echo "QUEUE: t2svm rc=$?"
gate_splice full

# 6. DP-parity pair at the documented runnable budget (VERDICT r4 next #5):
#    single side on the chip (fast), dp side on the 10-virtual-device CPU
#    mesh (~35 min on this single-core host).
timeout 1800 python tools/dp_parity.py --side single | tee /tmp/dp_single_queue.log
echo "QUEUE: dp-single rc=$?"
env MRGAN_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=10 \
  timeout 5400 python tools/dp_parity.py --side dp | tee /tmp/dp_dp_queue.log
# (round-5 run: the bare VAR=... prefix before the line continuation was
# executed as standalone assignments by bash -x — python saw the axon
# platform and exited; the stage was re-run manually with `env`, which is
# what the line above now uses)
echo "QUEUE: dp-dp rc=$?"
timeout 600 python tools/dp_parity.py --compare | tee /tmp/dp_compare_queue.log
echo "QUEUE: dp-compare rc=$?"

# 7. Figures from the fresh sweeps.
if [ -f artifacts/t1_sweep.jsonl ] && [ -f artifacts/t5_sweep.jsonl ]; then
  cat artifacts/t1_sweep.jsonl artifacts/t5_sweep.jsonl > /tmp/t15_sweep.jsonl
  timeout 1800 python paperplotly.py --checkpoint /tmp/t15_sweep.jsonl \
      --out-dir artifacts --synthetic
  echo "QUEUE: figures rc=$?"
fi

# 8. Full-scale rehearsal Table-5 chip stage (VERDICT r4 next #7; the
#    reference-true fabricate/process stages run as separate host jobs and
#    must have logged to artifacts/rehearsal.jsonl before this fires).
if [ -d data_processed_rehearsal ] && \
   ls data_processed_rehearsal/processed_* >/dev/null 2>&1; then
  timeout 10800 python tools/rehearse_full_scale.py --tables5 \
      | tee /tmp/rehearsal_t5.log
  echo "QUEUE: rehearsal-t5 rc=$?"
else
  echo "QUEUE: rehearsal-t5 skipped (no processed rehearsal set)"
fi

# 9. Narrow-width codegen-fault repro — LAST: each crashing width kills a
#    TPU worker subprocess by design. Control width 1280 must pass.
timeout 3600 python tools/repro_narrow_fault.py --dump-hlo \
    --out artifacts/narrow_fault | tee /tmp/narrow_fault_queue.log
echo "QUEUE: narrowfault rc=$?"

echo HWQUEUE_DONE
