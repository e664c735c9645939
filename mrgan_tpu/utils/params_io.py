"""Model parameter snapshots via orbax (SURVEY.md §5 checkpoint/resume).

The reference keeps no model checkpoints at all — every trained GAN is
discarded after returning a scalar error. For production serving and for
resuming long trainings, this saves/restores parameter pytrees (e.g. from
train.gan.train_folds(with_params=True)) with orbax, falling back to
pickled-numpy files if orbax is unavailable.
"""

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save(path, params):
    """Save a parameter pytree. Returns the path written."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _to_numpy(params), force=True)
        return path
    except Exception:  # noqa: BLE001 — orbax optional / fs-dependent
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fallback = path if path.endswith(".pkl") else path + ".pkl"
        with open(fallback, "wb") as f:
            pickle.dump(_to_numpy(params), f, pickle.HIGHEST_PROTOCOL)
        return fallback


def restore(path):
    """Restore a parameter pytree saved by ``save``."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer().restore(path)
    fallback = path if path.endswith(".pkl") else path + ".pkl"
    with open(fallback, "rb") as f:
        return pickle.load(f)
