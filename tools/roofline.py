#!/usr/bin/env python3
"""Analytic roofline/MFU model for the fused disc+gen GAN update.

Turns "the step is HBM-bound" (STATUS claim) into numbers: a FLOPs- and
bytes-per-update model of the production trainer (train/gan._train_one's
scan step at the flagship Table-1 shapes) combined with a measured
updates/s (bench.py) yields achieved TFLOP/s, achieved HBM GB/s, MFU
against the v5e bf16 peak, and HBM-roofline utilization.

Model assumptions (documented so the numbers can be audited):
- FLOPs: 2*M*K*N per matmul pass. Disc update: G forward (not
  differentiated, mr_gan.py:166 semantics) on bs rows + D fwd+dgrad+wgrad
  (3 passes) on 3*bs rows. Gen update: G fwd+dgrad+wgrad on bs rows + D
  fwd+dgrad (2 passes, D weights not differentiated) on 2*bs rows.
- Bytes: per matmul pass, the weight matrix streams from HBM once at the
  matmul dtype (bf16 shadows, GanConfig.matmul_weight_dtype); wgrad also
  writes a grad the size of the weights (f32). Adam update: read+write both
  moments (opt_state_dtype) + read+write master params (f32) + write bf16
  shadow. Activations at batch 50 are VMEM-resident noise (<2% of weight
  traffic) and are ignored.
- Peaks: v5e (TPU v5 lite) public specs — 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python tools/roofline.py [--updates-per-s N | --bench BENCH.json]
       [--feat-dim 3632]
Prints one JSON line; --status-paragraph prints prose for STATUS.md.
"""

import argparse
import json

GEN_HIDDEN = 500         # models/nets.py:92
DISC_WIDTHS = (1000, 500, 250, 250)   # models/nets.py:122
MID_WIDTH = 250
N_CLASSES = 6
NOISE = 100              # GanConfig.noise_size (mr_gan.py:77)
BS = 50                  # GanConfig.batch_size (mr_gan.py:78)

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def layer_shapes(feat_dim):
    gen = [(NOISE, GEN_HIDDEN), (GEN_HIDDEN, GEN_HIDDEN),
           (GEN_HIDDEN, feat_dim)]
    dims = [feat_dim, *DISC_WIDTHS, MID_WIDTH, N_CLASSES]
    disc = list(zip(dims[:-1], dims[1:]))
    return gen, disc


def model_per_update(feat_dim, bs=BS, mm_bytes=2, opt_bytes=2,
                     master_bytes=4):
    gen, disc = layer_shapes(feat_dim)
    g_macs = sum(k * n for k, n in gen)
    d_macs = sum(k * n for k, n in disc)
    g_params = sum(k * n + n for k, n in gen)
    d_params = sum(k * n + n for k, n in disc)

    # matmul passes per fused update: (rows, n_passes) per network
    disc_step = [("gen", g_macs, bs, 1), ("disc", d_macs, 3 * bs, 3)]
    gen_step = [("gen", g_macs, bs, 3), ("disc", d_macs, 2 * bs, 2)]
    flops = sum(2 * macs * rows * passes
                for _, macs, rows, passes in disc_step + gen_step)

    # weight streaming: every pass reads the bf16 shadow once
    passes_g = 1 + 3
    passes_d = 3 + 2
    bytes_weights = (passes_g * g_params + passes_d * d_params) * mm_bytes
    # wgrad writes (f32): G once (gen step), D once (disc step)
    bytes_grads = (g_params + d_params) * 4
    # Adam: moments r+w, master params r+w (f32), bf16 shadow refresh write
    p_total = g_params + d_params
    bytes_adam = p_total * (2 * 2 * opt_bytes + 2 * master_bytes + mm_bytes)
    return flops, bytes_weights + bytes_grads + bytes_adam, p_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feat-dim", type=int, default=3632)
    ap.add_argument("--updates-per-s", type=float, default=None)
    ap.add_argument("--bench", default=None,
                    help="BENCH_r*.json / bench.py output to read the "
                    "measured updates/s from")
    ap.add_argument("--status-paragraph", action="store_true")
    args = ap.parse_args()

    ups = args.updates_per_s
    if ups is None and args.bench:
        with open(args.bench) as f:
            ups = float(json.load(f)["value"])
    flops, byts, params = model_per_update(args.feat_dim)
    out = {
        "feat_dim": args.feat_dim,
        "params_total": params,
        "model_gflops_per_update": round(flops / 1e9, 3),
        "model_mbytes_per_update": round(byts / 1e6, 3),
        "arithmetic_intensity_flops_per_byte": round(flops / byts, 1),
        "ridge_flops_per_byte_v5e": round(V5E_BF16_TFLOPS * 1e12
                                          / (V5E_HBM_GBPS * 1e9), 1),
    }
    if ups:
        tflops = flops * ups / 1e12
        gbps = byts * ups / 1e9
        out.update({
            "measured_updates_per_s": ups,
            "achieved_tflops": round(tflops, 2),
            "achieved_hbm_gbps": round(gbps, 1),
            "mfu_pct": round(100 * tflops / V5E_BF16_TFLOPS, 2),
            "hbm_roofline_pct": round(100 * gbps / V5E_HBM_GBPS, 1),
        })
    print(json.dumps(out))
    if args.status_paragraph and ups:
        ai = flops / byts
        ridge = V5E_BF16_TFLOPS * 1e12 / (V5E_HBM_GBPS * 1e9)
        print(
            f"\nRoofline: the fused step moves ~{byts/1e6:.1f} MB and "
            f"computes ~{flops/1e9:.2f} GFLOP per disc+gen update "
            f"(arithmetic intensity {ai:.0f} FLOP/byte vs the v5e ridge at "
            f"{ridge:.0f}), i.e. the step is HBM-bound by ~{ridge/ai:.1f}x. "
            f"At the measured {ups:.0f} updates/s that is "
            f"{byts*ups/1e9:.0f} GB/s of HBM traffic "
            f"({100*byts*ups/1e9/V5E_HBM_GBPS:.0f}% of the 819 GB/s "
            f"roofline) and {flops*ups/1e12:.1f} TFLOP/s "
            f"({100*flops*ups/1e12/V5E_BF16_TFLOPS:.1f}% MFU)."
        )


if __name__ == "__main__":
    main()
