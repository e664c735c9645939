#!/usr/bin/env python3
"""Entry point mirroring others/mr_nn_activation_map.py: train the supervised
MLP on one modality, compute input-gradient class activation maps for sample
pokes, and save heatmap figures. The saliency math (normalized |d MSE/dx|,
min-max scaled) is in mrgan_tpu.variants.activation_maps.
"""

from mrgan_tpu.cli.activation_map import main

if __name__ == "__main__":
    main()
