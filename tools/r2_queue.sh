#!/bin/bash
# Round-2 prioritized hardware queue. The TPU pool returned mid-round after
# the outage, with roughly an hour of wall budget, so this variant of
# tools/hardware_queue.sh runs the SAME stages in strict evidence-priority
# order (flagship Table 1 first) and parks each round-1 artifact under
# artifacts/r1/ only when its own regen starts — tables the budget never
# reaches keep their round-1 evidence in place instead of vanishing.
# Every stage is bounded and independently resumable (sweep CLIs
# checkpoint per cell), exactly like the parent queue.
set -ux -o pipefail
cd "$(dirname "$0")/.."
P="--synthetic --seed 0 --epochs 100 --no-mesh"
mkdir -p artifacts/r1
park () {
  for f in "$@"; do
    if [ -f "artifacts/$f" ] && [ ! -f "artifacts/r1/$f" ]; then
      mv "artifacts/$f" "artifacts/r1/$f"
    fi
  done
}

# 1. Table 1 — the flagship label-efficiency curves with the hardened
#    round-2 generator (VERDICT missing #1).
park t1_sweep.jsonl t1_metrics.jsonl
timeout 2700 python mr_gan.py -t 1 $P \
    --checkpoint artifacts/t1_sweep.jsonl --metrics artifacts/t1_metrics.jsonl
echo "QUEUE: t1 rc=$?"

# 2. Table 6 — the semi-supervised (unlabeled-data) effect.
park t6_sweep.jsonl t6_metrics.jsonl
timeout 1200 python mr_gan.py -t 6 $P \
    --checkpoint artifacts/t6_sweep.jsonl --metrics artifacts/t6_metrics.jsonl
echo "QUEUE: t6 rc=$?"

# 3. Official bench line + flat scan-carry A/B.
timeout 900 python bench.py | tee /tmp/bench_queue.log
echo "QUEUE: bench rc=$?"
MRGAN_BENCH_FLAT_CARRY=1 timeout 900 python bench.py | tee /tmp/bench_flat.log
echo "QUEUE: bench-flat rc=$?"

# 4. Hardware-gated bf16 shadow exactness check.
timeout 600 python tools/check_shadow_exactness.py | tee /tmp/shadow_queue.log
echo "QUEUE: shadow rc=$?"

# 5. MLP Table 2 — the GAN-vs-MLP gap at 1 % labels under the new
#    generator (the paper's core claim). Table 4 is resumed in stage 10.
park t24_nn.jsonl t24_nn_metrics.jsonl
timeout 1500 python mr_nn.py -t 2 $P \
    --checkpoint artifacts/t24_nn.jsonl --metrics artifacts/t24_nn_metrics.jsonl
echo "QUEUE: t2nn rc=$?"

# 6. SVM Table 2.
park t2_svm.jsonl t2_svm_metrics.jsonl
timeout 900 python mr_svm.py -t 2 $P \
    --checkpoint artifacts/t2_svm.jsonl --metrics artifacts/t2_svm_metrics.jsonl
echo "QUEUE: t2svm rc=$?"

# 7. First STATUS splice so partial evidence lands even if the round ends
#    mid-queue (summarize is idempotent; rerun at the end).
timeout 600 python tools/compare_published.py | tee /tmp/compare_queue.log
echo "QUEUE: compare rc=$?"
timeout 600 python tools/summarize_regen.py --write
echo "QUEUE: summarize1 rc=$?"

# 8. Measured sweep-axis scaling curve.
timeout 1800 python tools/scaling_curve.py --out artifacts/scaling_curve.jsonl
echo "QUEUE: scaling rc=$?"

# 9. Table 5 duration sweep, then Table 3 LOO (the two longest).
park t5_sweep.jsonl t5_metrics.jsonl
timeout 5400 python mr_gan.py -t 5 $P \
    --checkpoint artifacts/t5_sweep.jsonl --metrics artifacts/t5_metrics.jsonl
echo "QUEUE: t5 rc=$?"
park t3_sweep.jsonl t3_metrics.jsonl
timeout 7200 python mr_gan.py -t 3 $P \
    --checkpoint artifacts/t3_sweep.jsonl --metrics artifacts/t3_metrics.jsonl
echo "QUEUE: t3 rc=$?"

# 10. NN Table 4 LOO (resumes Table 2 cells from the stage-5 checkpoint).
timeout 5400 python mr_nn.py -t 2 4 $P \
    --checkpoint artifacts/t24_nn.jsonl --metrics artifacts/t24_nn_metrics.jsonl
echo "QUEUE: t4nn rc=$?"

# 11. Serving latency/throughput surface.
timeout 1800 python tools/serve_bench.py | tee /tmp/serve_bench.log
echo "QUEUE: serve rc=$?"

# 12. Figures from the fresh sweeps + final comparison + STATUS splice.
cat artifacts/t1_sweep.jsonl artifacts/t5_sweep.jsonl > /tmp/t15_sweep.jsonl || true
timeout 1800 python paperplotly.py --checkpoint /tmp/t15_sweep.jsonl \
    --out-dir artifacts --synthetic
echo "QUEUE: figures rc=$?"
timeout 600 python tools/compare_published.py | tee /tmp/compare_queue.log
timeout 600 python tools/summarize_regen.py --write
echo "QUEUE: summarize2 rc=$?"

echo HWQUEUE_DONE
