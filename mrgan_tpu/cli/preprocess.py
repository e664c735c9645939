"""CLI for the offline preprocessing pipeline (reference processdata.py).

Raw acquisition pickles -> processed MREO pickles over the 14 window configs
(reference processdata.py:10-92), executed as batched on-device gather+lerp
kernels instead of ~400k serial scipy interp1d calls.
"""

import argparse

from mrgan_tpu.data import preprocess


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Window and resample raw poke data around impact times."
    )
    parser.add_argument("--raw-dir", default="data_raw")
    parser.add_argument("--out-dir", default="data_processed")
    parser.add_argument(
        "--prefix", default="custom_",
        help="Output filename prefix (reference safety latch; '' writes "
             "loader-visible processed_*.pkl)",
    )
    parser.add_argument(
        "--configs", type=int, nargs="*", default=None,
        help="Indices into the 14 (duration, contact) configs; default all",
    )
    args = parser.parse_args(argv)
    configs = (
        [preprocess.CONFIGS[i] for i in args.configs]
        if args.configs is not None
        else None
    )
    preprocess.run(raw_dir=args.raw_dir, out_dir=args.out_dir,
                   configs=configs, prefix=args.prefix)


if __name__ == "__main__":
    main()
