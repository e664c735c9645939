"""CLI mirroring others/mr_gan_autoencoder.py: semi-supervised GAN with
dense-autoencoder pretraining on raw contact waveforms (modality 3 in that
variant returns raw audio; encoderNodes [1024, 512, 256] at :309).
"""

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Semi-supervised GAN with autoencoder pretraining.")
    parser.add_argument("-t", "--tables", nargs="+", required=True)
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic-pokes", type=int, default=100)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--encoder-nodes", type=int, nargs="+",
                        default=[1024, 512, 256])
    parser.add_argument("--percents", type=int, nargs="+",
                        default=[1, 2, 4, 8, 16, 50, 100])
    args = parser.parse_args(argv)

    from mrgan_tpu import MODALITY_NAMES
    from mrgan_tpu.data import mreo, synthetic
    from mrgan_tpu.train import gan
    from mrgan_tpu.utils import metrics as M
    from mrgan_tpu.variants import autoencoder

    seed = np.random.randint(2**31 - 1) if args.seed is None else args.seed

    def raw_contact_dataset():
        """The variant's modality 3 = RAW contact waveforms
        (mr_gan_autoencoder.py:57-58), not the mel features."""
        if args.synthetic or not mreo.have_processed("data_processed"):
            synth = synthetic.generate_processed(
                seed=seed, pokes_per_object=args.synthetic_pokes)
            xs, ys = [], []
            for m, material in enumerate(synth):
                for obj in synth[material].values():
                    xs.append(np.asarray(obj["contact"], np.float32))
                    ys.append(np.full(len(obj["contact"]), m, np.int32))
            return np.concatenate(xs), np.concatenate(ys)
        xs, ys = [], []
        from mrgan_tpu import MATERIALS

        for m, material in enumerate(MATERIALS):
            data = mreo._load_material("data_processed", material, 4, 0.2)
            for obj in data.values():
                arr = np.asarray(obj["contact"], np.float32)
                xs.append(arr)
                ys.append(np.full(len(arr), m, np.int32))
        return np.concatenate(xs), np.concatenate(ys)

    if "1" in args.tables:
        M.header("Testing various amounts of labeled training data")
        M.modality_header(MODALITY_NAMES[3])
        x, y = raw_contact_dataset()
        ae_cfg = autoencoder.AeConfig(nodes=tuple(args.encoder_nodes))
        gan_cfg = gan.GanConfig(epochs=args.epochs)
        for percent in args.percents:
            M.subheader("Percentage of training data labeled: %d%%" % percent)
            errs = autoencoder.run_ae_gan_cell(
                x, y, percent, ae_cfg=ae_cfg, gan_cfg=gan_cfg, seed=seed)
            for e in errs:
                M.p("Test accuracy:", 1.0 - e)
            M.p("Average accuracy:", float(np.mean(1.0 - errs)))


if __name__ == "__main__":
    main()
