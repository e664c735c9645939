"""CLI mirroring others/mr_nn_activation_map.py: train the supervised MLP on
one modality, compute input-gradient class activation maps for sample pokes,
and save heatmap figures. The saliency math (normalized |d MSE/dx|, min-max
scaled) is in mrgan_tpu.variants.activation_maps.
"""

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Class activation maps for the supervised MLP.")
    parser.add_argument("-m", "--modality", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--samples", type=int, default=8,
                        help="Test pokes to map")
    parser.add_argument("--out-dir", default="plots")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic-pokes", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax

    from mrgan_tpu.data import mreo
    from mrgan_tpu.train import gan as gan_mod
    from mrgan_tpu.train import mlp, protocol
    from mrgan_tpu.variants import activation_maps

    x, y = mreo.load_features(
        modalities=args.modality,
        synthetic_seed=args.seed if args.synthetic else None,
        synthetic_kwargs={"pokes_per_object": args.synthetic_pokes})
    rng = np.random.RandomState(args.seed)
    (tr, te), *_ = protocol.stratified_splits(y, n_splits=6, seed=args.seed)
    fold = protocol.prepare_fold(x[tr], y[tr], x[te], y[te], 100, None, 6, rng)

    cfg = mlp.MlpConfig(epochs=args.epochs)
    xl, valid_dim = gan_mod.pad_features(fold["x_labeled"][None],
                                         cfg.pad_multiple)
    xt, _ = gan_mod.pad_features(fold["x_test"][None], cfg.pad_multiple)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), 1)

    # Train one fold and keep the parameters for the gradient maps — the one
    # production trainer, with_params=True (no duplicated training loop).
    err, aux = mlp.train_folds(keys, xl, fold["y_labeled"][None], xt,
                               fold["y_test"][None], valid_dim=valid_dim,
                               cfg=cfg, with_params=True)
    print("Test error:", float(err[0]))
    params = jax.tree.map(lambda a: a[0], aux["params"])

    x_test = np.asarray(xt[0][: args.samples])
    y_test_1h = np.eye(cfg.num_classes,
                       dtype=np.float32)[fold["y_test"][: args.samples]]
    cams = np.asarray(activation_maps.mlp_saliency(params, x_test, y_test_1h))

    os.makedirs(args.out_dir, exist_ok=True)
    fig, axes = plt.subplots(args.samples, 1,
                             figsize=(10, 1.2 * args.samples))
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.imshow(cams[i : i + 1, :valid_dim], cmap="jet", aspect="auto")
        norm = x_test[i, :valid_dim]
        norm = (norm - norm.min()) / max(norm.max() - norm.min(), 1e-9) - 0.5
        ax.plot(norm, "w", linewidth=0.6)
        ax.set_yticks([])
    path = os.path.join(args.out_dir, "activation_maps.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("Wrote", path)


if __name__ == "__main__":
    main()
