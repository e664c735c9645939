#!/bin/bash
# Round-4 calibration probe iteration: the three weak curve families from
# VERDICT r3 (T5 force shape, T1 temperature span, T5 mic shape) plus the
# global-bias sentinels (m5/m6 @100%). One host core: strictly sequential.
set -ux
cd "$(dirname "$0")/.."

# T5 force durations @100% (pub 70.9/75.1/81.8/86.9/87.9)
timeout 2400 python tools/probe_cell.py --modality 0 --percents 100 \
    --forcetemp-times 0.1 0.2 0.5 1.0 4.0
# T1 temperature label curve (pub 53.8/62.6/71.2/82.1)
timeout 1800 python tools/probe_cell.py --modality 1 --percents 1 4 16 100
# T5 temperature low end @100% (pub 58.9 @0.1s, 73.9 @1s)
timeout 1200 python tools/probe_cell.py --modality 1 --percents 100 \
    --forcetemp-times 0.1 1.0
# T5 mic durations @100% (pub 63.3/83.1/83.8/84.6)
timeout 3600 python tools/probe_cell.py --modality 3 --percents 100 \
    --contactmic-times 0.05 0.2 0.5 1.0
# global-bias sentinels (pub m5=96.2, m6=91.8 @100; m6@1 pub 58.2)
timeout 1200 python tools/probe_cell.py --modality 5 --percents 100
timeout 1800 python tools/probe_cell.py --modality 6 --percents 1 100
echo "PROBE_DONE"
