"""Mesh construction for the sweep ("cell") and data-parallel ("data") axes.

The reference has no device mesh at all (single Theano device, mr_gan.py:2);
here every table sweep runs over a ``jax.sharding.Mesh`` whose "cell" axis
carries independent trainings (folds x sweep points) and whose optional
"data" axis shards the batch within a training.
"""

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_cell=None, n_data=1, devices=None):
    """Build a ("cell", "data") mesh.

    Defaults to all visible devices on the cell axis — the right layout for
    these small-model sweeps where each chip trains whole cells.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_cell is None:
        n_cell = len(devices) // n_data
    assert n_cell * n_data <= len(devices), (
        f"mesh {n_cell}x{n_data} needs {n_cell * n_data} devices, "
        f"have {len(devices)}"
    )
    dev_grid = np.asarray(devices[: n_cell * n_data]).reshape(n_cell, n_data)
    return Mesh(dev_grid, ("cell", "data"))


def cell_sharding(mesh):
    """Leading-axis sharding over the cell axis (replicated over data)."""
    return NamedSharding(mesh, P("cell"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(n, m):
    return math.ceil(n / m) * m
