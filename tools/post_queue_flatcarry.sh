#!/bin/bash
# Follower for tools/r3_queue.sh: the queue's own stage-7 flat-carry check ran
# before the tool's narrow-width fix landed (it wedged at d=384, the known
# TPU-worker fault shape) and timed out. This waits for the queue to release
# the chip, then reruns the fixed check (d=1280) once, on hardware.
set -ux -o pipefail
cd "$(dirname "$0")/.."
if [ -f /tmp/hwqueue.pid ]; then
  pid="$(cat /tmp/hwqueue.pid)"
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
timeout 1200 python tools/check_flat_carry.py 2>&1 | tee /tmp/flat_carry_r3.log
echo "FLATCARRY rc=$?"
