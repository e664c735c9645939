"""CLI for figure generation (reference paperplotly.py).

Regenerates the paper figures: accuracy curves for Tables 1/5 (published
numbers by default, or --checkpoint to plot a sweep you ran), and sample
trace/spectrogram figures from processed data.
"""

import argparse

from mrgan_tpu.reports import plots


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate paper figures.")
    parser.add_argument("--out-dir", default="plots")
    parser.add_argument("--checkpoint", default=None,
                        help="Sweep checkpoint JSONL to plot instead of the "
                             "published numbers")
    parser.add_argument("--data-dir", default="data_processed")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--presentation", action="store_true",
                        help="Presentation styling "
                             "(others/paperplotly_presentation.py)")
    args = parser.parse_args(argv)

    made = [
        plots.plot_table1(args.out_dir, args.checkpoint, args.presentation),
        plots.plot_table5(args.out_dir, args.checkpoint, args.presentation),
    ]
    made += plots.plot_sample_traces(
        args.out_dir, data_dir=args.data_dir,
        synthetic_seed=0 if args.synthetic else None)
    for path in made:
        print("Wrote", path)


if __name__ == "__main__":
    main()
