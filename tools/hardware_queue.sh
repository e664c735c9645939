#!/bin/bash
# The full hardware work queue for a round: run everything that needs the
# real chip, in priority order, logging each stage. Designed to be launched
# by a recovery watcher after a TPU-pool outage:
#   nohup bash tools/hardware_queue.sh > /tmp/hwqueue.log 2>&1 &
# Every stage is independently resumable/skippable; a stage crash moves on
# to the next (sweep CLIs already checkpoint per cell). Each stage is also
# bounded with `timeout`: if the pool drops mid-queue, backend init hangs
# forever inside the client (known outage shape), and an unbounded stage
# would wedge the whole queue. A timed-out stage leaves its checkpoint
# behind, so relaunching the queue retries only what is missing.
set -ux -o pipefail
cd "$(dirname "$0")/.."

# 0. Clear the host core. During a pool outage an interim CPU-evidence job
# may be running (full-scale accuracy cells on the CPU backend; its pid is
# recorded in /tmp/cpuacc*.pid — never kill by pattern). Hardware regen
# strictly supersedes that evidence, and a busy host core corrupts the
# timed stages below (bench + scaling curve) and starves TPU feeding.
for f in /tmp/cpuacc.pid /tmp/cpuacc2.pid; do
  if [ -f "$f" ]; then kill "$(cat "$f")" 2>/dev/null || true; fi
done
echo "QUEUE: host cleared"

# 1. Regenerate every table artifact with the round-2 synthetic generator.
timeout 21600 bash tools/regen_artifacts.sh
echo "QUEUE: regen rc=$?"

# 2. Measured sweep-axis scaling curve (VERDICT round-1 item 4).
timeout 3600 python tools/scaling_curve.py --out artifacts/scaling_curve.jsonl
echo "QUEUE: scaling rc=$?"

# 3. Official benchmark line.
timeout 1800 python bench.py | tee /tmp/bench_queue.log
echo "QUEUE: bench rc=$?"

# 3b. Flat scan-carry A/B (optim.CarryPack): if this beats stage 3, flip
# GanConfig.flat_small_carry's default and rerun the official line.
MRGAN_BENCH_FLAT_CARRY=1 timeout 1800 python bench.py | tee /tmp/bench_flat.log
echo "QUEUE: bench-flat rc=$?"

# 4. Hardware-gated bf16 shadow exactness check.
timeout 1200 python tools/check_shadow_exactness.py
echo "QUEUE: shadow rc=$?"

# 5. Published-curve comparison over the fresh artifacts.
timeout 600 python tools/compare_published.py | tee /tmp/compare_queue.log
echo "QUEUE: compare rc=$?"

# 6. Serving latency/throughput surface.
timeout 1800 python tools/serve_bench.py | tee /tmp/serve_bench.log
echo "QUEUE: serve rc=$?"

# 7. Splice the round's hardware evidence into STATUS.md.
timeout 600 python tools/summarize_regen.py --write
echo "QUEUE: summarize rc=$?"

echo HWQUEUE_DONE
