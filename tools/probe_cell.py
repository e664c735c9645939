#!/usr/bin/env python3
"""General single-cell GAN probe for calibrating the synthetic generator.

Runs the production GAN cell protocol (cli/tables.py semantics: 6 stratified
folds, epochs 100, pad_min 1280) for a grid of modalities x label percents x
(forcetemp, contactmic) durations, printing each cell's accuracy next to the
published value when one exists (reference paperplotly.py:16-23,49-54).

Replaces/generalizes t5_probe.py (force durations only, 100% labels): the
round-4 calibration targets Table-1 label-efficiency shapes (temperature
span) and the Table-5 mic curve as well (VERDICT r3 next #1).

Usage examples:
  python tools/probe_cell.py --modality 1 --percents 1 100
  python tools/probe_cell.py --modality 3 --percents 100 \
      --contactmic-times 0.05 0.2 0.5 1.0
  python tools/probe_cell.py --modality 0 --percents 100 \
      --forcetemp-times 0.1 0.2 0.5 1.0 4.0
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# published GAN accuracies (reference paperplotly.py):
# TABLE1[modality][percent] — :17-23 ; TABLE5[modality][duration] — :49-54
TABLE1 = {
    0: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (62.1, 70.4, 72.2, 77.7, 79.8, 85.8, 87.9))),
    1: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (53.8, 59.0, 64.1, 68.1, 69.0, 80.0, 82.1))),
    2: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (74.3, 81.4, 85.6, 88.5, 90.2, 94.2, 95.3))),
    3: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (42.9, 53.9, 62.6, 67.5, 73.4, 79.8, 83.1))),
    4: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (52.4, 68.3, 79.2, 84.9, 87.4, 91.2, 92.2))),
    5: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (62.8, 75.4, 85.6, 89.4, 92.0, 95.4, 96.2))),
    6: dict(zip((1, 2, 4, 8, 16, 50, 100),
                (58.2, 67.5, 73.8, 80.2, 84.7, 89.7, 91.8))),
}
TABLE5_FT = {
    0: dict(zip((0.1, 0.2, 0.5, 1.0, 2.0, 3.0, 4.0),
                (70.9, 75.1, 81.8, 86.9, 87.6, 87.6, 87.9))),
    1: dict(zip((0.1, 0.2, 0.5, 1.0, 2.0, 3.0, 4.0),
                (58.9, 64.4, 70.4, 73.9, 77.5, 80.3, 82.1))),
    2: dict(zip((0.1, 0.2, 0.5, 1.0, 2.0, 3.0, 4.0),
                (84.4, 88.6, 92.4, 94.4, 95.0, 94.8, 95.3))),
}
TABLE5_MIC = dict(zip((0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0),
                      (63.3, 77.0, 83.1, 82.4, 83.8, 84.0, 84.6)))


def _published(modality, percent, ft, cm):
    if percent != 100:
        return TABLE1.get(modality, {}).get(percent)
    if modality == 3 and cm != 0.2:
        return TABLE5_MIC.get(cm)
    if ft != 4.0 and modality in TABLE5_FT:
        return TABLE5_FT[modality].get(ft)
    return TABLE1.get(modality, {}).get(percent)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", type=int, default=1)
    ap.add_argument("--percents", type=float, nargs="+", default=[100])
    ap.add_argument("--forcetemp-times", type=float, nargs="+", default=[4.0])
    ap.add_argument("--contactmic-times", type=float, nargs="+", default=[0.2])
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mrgan_tpu.data import mreo
    from mrgan_tpu.train import gan, protocol
    from mrgan_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = gan.GanConfig(epochs=args.epochs, pad_min=1280)
    for ft in args.forcetemp_times:
        for cm in args.contactmic_times:
            t0 = time.time()
            x, y = mreo.load_features(
                modalities=args.modality, forcetemp_time=ft,
                contactmic_time=cm, synthetic_seed=args.seed)
            gen_s = time.time() - t0
            for pct in args.percents:
                t1 = time.time()
                errors = protocol.run_gan_cell(x, y, pct, cfg=cfg,
                                               seed=args.seed)
                acc = 100.0 * (1.0 - float(np.mean(errors)))
                pub = _published(args.modality, pct, ft, cm)
                pub_s = f" pub={pub:5.1f} d={acc - pub:+5.1f}" if pub else ""
                print(f"m{args.modality} ft={ft:4g} cm={cm:4g} "
                      f"pct={pct:5g} acc={acc:5.1f}{pub_s} "
                      f"({time.time() - t1:.0f}s train, {gen_s:.0f}s gen)")
                sys.stdout.flush()


if __name__ == "__main__":
    main()
