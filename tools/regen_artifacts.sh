#!/bin/bash
# Regenerate every table artifact on hardware with the round-2 hardened
# synthetic generator. Run from the repo root, detached:
#   nohup bash tools/regen_artifacts.sh > /tmp/regen.log 2>&1 &
# Old (round-1 generator) artifacts are preserved under artifacts/r1/.
# Checkpoints make every stage resumable: rerunning the script retries only
# missing/failed cells.
set -ux
mkdir -p artifacts/r1
for f in t1_sweep t1_metrics t3_sweep t3_metrics t5_sweep t5_metrics \
         t6_sweep t6_metrics t24_nn t24_nn_metrics t2_svm t2_svm_metrics; do
  [ -f "artifacts/$f.jsonl" ] && [ ! -f "artifacts/r1/$f.jsonl" ] \
    && mv "artifacts/$f.jsonl" "artifacts/r1/$f.jsonl"
done

P="--synthetic --seed 0 --epochs 100 --no-mesh"
timeout 7200 python mr_gan.py -t 1 $P --checkpoint artifacts/t1_sweep.jsonl \
    --metrics artifacts/t1_metrics.jsonl
timeout 3600 python mr_gan.py -t 6 $P --checkpoint artifacts/t6_sweep.jsonl \
    --metrics artifacts/t6_metrics.jsonl
timeout 7200 python mr_nn.py -t 2 4 $P --checkpoint artifacts/t24_nn.jsonl \
    --metrics artifacts/t24_nn_metrics.jsonl
timeout 3600 python mr_svm.py -t 2 $P --checkpoint artifacts/t2_svm.jsonl \
    --metrics artifacts/t2_svm_metrics.jsonl
timeout 7200 python mr_gan.py -t 5 $P --checkpoint artifacts/t5_sweep.jsonl \
    --metrics artifacts/t5_metrics.jsonl
timeout 9000 python mr_gan.py -t 3 $P --checkpoint artifacts/t3_sweep.jsonl \
    --metrics artifacts/t3_metrics.jsonl

# Refresh the figures from the regenerated sweeps (curves_from_checkpoint
# filters records by table, so the concatenated file serves both plots).
cat artifacts/t1_sweep.jsonl artifacts/t5_sweep.jsonl > /tmp/t15_sweep.jsonl
timeout 1800 python paperplotly.py --checkpoint /tmp/t15_sweep.jsonl --out-dir artifacts \
    --synthetic
echo REGEN_DONE
