"""Experiment protocols: fold construction, scaling, labeled-subset selection.

Host-side replication of the reference's per-fold data preparation
(mr_gan.py:87-107): StandardScaler fit on train / applied to test, shuffle,
then the first ``10*percentlabeled`` examples of each class form the labeled
pool (and optionally the first ``10*(percentlabeled+percentunlabeled)`` form
the unlabeled pool). The prepared folds are stacked along a leading fold axis
and trained as ONE fused vmapped XLA program (train.gan.train_folds).

Protocol generators (stratified 6-fold, leave-one-object-out over 72 objects)
match mr_gan.py:255-279.
"""

import dataclasses

import numpy as np
from sklearn.model_selection import StratifiedKFold

from . import gan
from ..ops import scaler as ops_scaler


class DeviceDataset:
    """HBM-resident feature matrix reused across all sweep cells.

    Uploading X once per modality and building folds on device (index
    gathers + on-device scaling, gan._train_one_indexed) cuts per-cell
    host->device traffic from ~1 GB of stacked folds to a few KB of indices —
    the north star's "stream HBM-resident batches".
    """

    def __init__(self, x, y, pad_multiple=128, mesh=None, pad_min=0):
        import jax

        self.pad_min = pad_min
        xp, self.valid_dim = gan.pad_features(
            np.asarray(x, np.float32), pad_multiple, pad_min
        )
        self.y_host = np.asarray(y, np.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self.X = jax.device_put(xp, rep)
            self.y = jax.device_put(self.y_host, rep)
        else:
            self.X = jax.device_put(xp)
            self.y = jax.device_put(self.y_host)
        self.mesh = mesh

    def __len__(self):
        return len(self.y_host)


def fold_indices(y, train_idx, test_idx, percentlabeled, percentunlabeled,
                 num_classes, rng):
    """Index-space replication of the reference's fold prep (mr_gan.py:100-107):
    shuffle the train rows, take the first 10*percent per class as labeled
    (and first 10*(percent+percentunlabeled) as the unlabeled pool)."""
    train_idx = np.asarray(train_idx)
    perm = rng.permutation(len(train_idx))
    shuffled = train_idx[perm]
    ys = y[shuffled]
    n_lab = int(10 * percentlabeled)
    lab = np.concatenate(
        [shuffled[ys == j][:n_lab] for j in range(num_classes)]
    )
    if percentunlabeled is not None:
        n_pool = n_lab + int(10 * percentunlabeled)
        pool = np.concatenate(
            [shuffled[ys == j][:n_pool] for j in range(num_classes)]
        )
    else:
        pool = shuffled
    return (lab.astype(np.int32), pool.astype(np.int32),
            train_idx.astype(np.int32), np.asarray(test_idx, np.int32))


def select_labeled(x_train, y_train, num_per_class, num_classes, rng):
    """mr_gan.py:101-103: shuffle, then first-n-per-class."""
    perm = rng.permutation(len(x_train))
    x_train = x_train[perm]
    y_train = y_train[perm]
    xs, ys = [], []
    for j in range(num_classes):
        xs.append(x_train[y_train == j][:num_per_class])
        ys.append(np.full(min(num_per_class, (y_train == j).sum()), j, np.int32))
    return np.concatenate(xs, 0), np.concatenate(ys, 0), x_train, y_train


def scale_fold(x_train, x_test):
    """StandardScaler semantics (population std; constant and NEAR-constant
    columns pass through — guard and rationale in ops.scaler, the single
    canonical implementation)."""
    mean, std = ops_scaler.fit_numpy(x_train)
    return (x_train - mean) / std, (x_test - mean) / std


def prepare_fold(x_train, y_train, x_test, y_test, percentlabeled,
                 percentunlabeled=None, num_classes=6, rng=None):
    """Returns dict of per-fold arrays ready for stacking."""
    rng = rng or np.random
    n_lab = int(10 * percentlabeled)
    x_train = np.asarray(x_train, np.float32)
    x_test = np.asarray(x_test, np.float32)
    x_train, x_test = scale_fold(x_train, x_test)
    x_labeled, y_labeled, x_shuf, y_shuf = select_labeled(
        x_train, y_train, n_lab, num_classes, rng
    )
    if percentunlabeled is not None:
        n_unl = n_lab + int(10 * percentunlabeled)
        pool = np.concatenate(
            [x_shuf[y_shuf == j][:n_unl] for j in range(num_classes)], 0
        )
    else:
        pool = x_train
    return {
        "x_labeled": x_labeled.astype(np.float32),
        "y_labeled": y_labeled.astype(np.int32),
        "pool": pool.astype(np.float32),
        "x_test": x_test.astype(np.float32),
        "y_test": np.asarray(y_test, np.int32),
        "n_train": len(x_train),
    }


def stack_folds(folds):
    keys = ("x_labeled", "y_labeled", "pool", "x_test", "y_test")
    return {k: np.stack([f[k] for f in folds]) for k in keys} | {
        "n_train": folds[0]["n_train"]
    }


def stratified_splits(y, n_splits=6, seed=None):
    """StratifiedKFold(n_splits, shuffle=True) index pairs (mr_gan.py:255)."""
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return list(skf.split(np.zeros(len(y)), y))


def loo_splits(objects):
    """Leave-one-object-out splits from a {name: {'x','y'}} dict
    (mr_gan.py:274-279). Yields (name, x_train, y_train, x_test, y_test)."""
    names = list(objects.keys())
    for name in names:
        x_test = np.array(objects[name]["x"])
        y_test = np.array(objects[name]["y"])
        x_train = np.concatenate(
            [np.array(objects[n]["x"]) for n in names if n != name], 0
        )
        y_train = np.concatenate(
            [np.array(objects[n]["y"]) for n in names if n != name], 0
        )
        yield name, x_train, y_train, x_test, y_test


def run_gan_cell(x, y=None, percentlabeled=50, percentunlabeled=None,
                 cfg: gan.GanConfig = gan.GanConfig(), seed=0, n_splits=6,
                 splits=None, verbose=False, mesh=None):
    """One sweep cell: k folds trained fused; returns per-fold test errors.

    ``x``: feature matrix, or a DeviceDataset (preferred — folds are then
    built on device from index vectors with zero bulk re-upload).
    ``splits``: optional explicit (train_idx, test_idx) pairs, else
    stratified ``n_splits``-fold.
    ``mesh``: optional ("cell","data") mesh — folds shard across its cell axis.
    """
    rng = np.random.RandomState(seed)
    ds = x if isinstance(x, DeviceDataset) else DeviceDataset(
        x, y, cfg.pad_multiple, mesh=mesh, pad_min=cfg.pad_min
    )
    required = gan.pad_dim(ds.valid_dim, cfg.pad_multiple, cfg.pad_min)
    if ds.X.shape[-1] < required:
        # The dataset was padded at construction; a wider cfg.pad_min can't
        # be applied retroactively, and silently skipping the bucketing
        # reintroduces the narrow-width backend fault it exists to avoid.
        raise ValueError(
            f"DeviceDataset was built with padded width {ds.X.shape[-1]} "
            f"(pad_min={getattr(ds, 'pad_min', 0)}) but cfg.pad_min="
            f"{cfg.pad_min} requires width >= {required}; rebuild the "
            "DeviceDataset with pad_min=cfg.pad_min.")
    if splits is None:
        splits = stratified_splits(ds.y_host, n_splits=n_splits, seed=seed)
    idx = [
        fold_indices(ds.y_host, tr, te, percentlabeled, percentunlabeled,
                     cfg.num_classes, rng)
        for tr, te in splits
    ]
    if verbose:
        # Per-epoch verbose parity (mr_gan.py:219-227): train with epoch
        # metrics on (incl. the per-epoch test pass) and print the
        # reference's epoch line per fold. The fused scan has no per-epoch
        # host timing, so the time field is the cell wall amortized per
        # epoch — a documented deviation.
        import time

        cfg_v = dataclasses.replace(cfg, track_epoch_metrics=True)
        t0 = time.perf_counter()
        # -v keeps the sweep sharded: the sharded indexed trainer returns
        # the per-epoch metric arrays too (sweep.train_gan_work_indexed
        # with_metrics), gathered to host after the fused launch.
        errs, metrics = run_indexed_folds(ds, idx, cfg_v, rng, mesh=mesh,
                                          with_metrics=True)
        dt = (time.perf_counter() - t0) / max(cfg.epochs * len(idx), 1)
        for f in range(len(errs)):
            for e in range(cfg.epochs):
                print("Epoch %d, time = %ds, loss labeled = %.4f, "
                      "loss unlabeled = %.4f, train error = %.4f, "
                      "test error = %.4f" % (
                          e + 1, int(dt), metrics["loss_lab"][f][e],
                          metrics["loss_unl"][f][e],
                          metrics["train_err"][f][e],
                          metrics["test_err"][f][e]))
            print("Test error:", float(errs[f]))
        return errs
    return run_indexed_folds(ds, idx, cfg, rng, mesh=mesh)


# Per-launch byte budget for the fused trainer's gathered fold arrays.
# Calibrated on this v5e worker: 6 folds x feat 3712 (~1.7 GB gathered) is
# proven over thousands of trainings and 3 x 12032 (~2.8 GB) passes a probed
# 100-epoch run, while 6 x 12032 (~5.5 GB) crashes the worker; chunking keeps
# every launch at or under the proven ~2.8 GB point. vmap widths beyond 6
# crash independently of bytes (probed in run_gan_loo), so the LOO driver
# also caps width at 6/device.
FOLD_LAUNCH_BYTE_BUDGET = 2.9e9


def _fold_launch_chunk(n_folds, feat_dim, n_lab, n_pool, n_train, n_test):
    """Max folds per fused launch within the gathered-bytes budget."""
    per_fold = 4.0 * feat_dim * (n_train + n_lab + n_pool + n_test)
    chunk = int(max(1, min(n_folds, FOLD_LAUNCH_BYTE_BUDGET // per_fold)))
    # Balance launches (6 folds at budget 4 -> 3+3, one compiled width,
    # instead of 4+2, two widths)
    n_launch = -(-n_folds // chunk)
    return -(-n_folds // n_launch)


def run_indexed_folds(ds, idx, cfg, rng, mesh=None, with_metrics=False):
    """Stack per-fold index tuples and train fused against ds.X.

    Folds run in as few fused launches as the byte budget allows (all 6 in
    one program at the reference shapes; wide-feature Table-5 audio cells
    split into smaller launches instead of crashing the worker).
    ``with_metrics`` (requires cfg.track_epoch_metrics) additionally returns
    {metric: (F, epochs)} from the single-process path.
    """
    from ..utils import rng as rng_util

    lab, pool, train, test = (np.stack([f[i] for f in idx]) for i in range(4))
    keys = rng_util.make_keys(rng.randint(2**31 - 1), len(idx))
    if mesh is not None and mesh.shape.get("cell", 1) > 1:
        from ..parallel import sweep

        # The byte budget is per device: a launch of W folds over n_cell
        # devices gathers W/n_cell folds' arrays on each, so the sharded
        # path chunks at (single-device chunk) x n_cell — without this the
        # halved-budget cell retry (cli.tables.Ctx.cell) would re-run an
        # identical program on the mesh path.
        chunk = _fold_launch_chunk(
            len(idx), ds.X.shape[-1], lab.shape[1], pool.shape[1],
            train.shape[1], test.shape[1]) * mesh.shape["cell"]
        out = [
            sweep.train_gan_work_indexed(
                keys[s : s + chunk], ds.X, ds.y, lab[s : s + chunk],
                pool[s : s + chunk], train[s : s + chunk],
                test[s : s + chunk],
                valid_dim=ds.valid_dim, cfg=cfg, mesh=mesh,
                with_metrics=with_metrics)
            for s in range(0, len(idx), chunk)
        ]
        if with_metrics:
            return (np.concatenate([e for e, _ in out]),
                    {k: np.concatenate([m[k] for _, m in out])
                     for k in out[0][1]})
        return np.concatenate(out)
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        # No cell axis to shard over -> run the cell data-parallel: the
        # fused epoch-scan trainer under shard_map with the batch dimension
        # split across "data" (VERDICT r2 weak #4 — the production DP path
        # for cells whose data needs the mesh, e.g. the 20 GB full Table-5
        # set). Exactness vs the single-device trainer is pinned by
        # tests/test_parallel.py::test_dp_cell_epoch_matches_single_device.
        from ..parallel import spmd

        # Index vectors are replicated under shard_map, so EVERY device
        # gathers every fold's full scaled arrays — the per-device bytes are
        # the whole launch. Chunk at the single-device budget (a 6 x 12032
        # Table-5 launch is the documented worker-crash shape above).
        chunk = _fold_launch_chunk(
            len(idx), ds.X.shape[-1], lab.shape[1], pool.shape[1],
            train.shape[1], test.shape[1])
        out = [
            spmd.train_gan_cell_dp(
                keys[s : s + chunk], ds.X, ds.y, lab[s : s + chunk],
                pool[s : s + chunk], train[s : s + chunk],
                test[s : s + chunk],
                valid_dim=ds.valid_dim, cfg=cfg, mesh=mesh,
                with_metrics=with_metrics)
            for s in range(0, len(idx), chunk)
        ]
        if with_metrics:
            return (np.concatenate([np.asarray(e) for e, _ in out]),
                    {k: np.concatenate([np.asarray(m[k]) for _, m in out])
                     for k in out[0][1]})
        return np.concatenate([np.asarray(o) for o in out])
    chunk = _fold_launch_chunk(
        len(idx), ds.X.shape[-1], lab.shape[1], pool.shape[1],
        train.shape[1], test.shape[1],
    )
    errs, mets = [], []
    for s in range(0, len(idx), chunk):
        e = gan.train_folds_indexed(
            keys[s : s + chunk], ds.X, ds.y, lab[s : s + chunk],
            pool[s : s + chunk], train[s : s + chunk], test[s : s + chunk],
            valid_dim=ds.valid_dim, cfg=cfg, with_metrics=with_metrics,
        )
        if with_metrics:
            e, m = e
            mets.append({k: np.asarray(v) for k, v in m.items()})
        errs.append(np.asarray(e))
    errs = np.concatenate(errs)
    if with_metrics:
        return errs, {k: np.concatenate([m[k] for m in mets]) for k in mets[0]}
    return errs


def run_prepared_folds(folds, cfg, rng, mesh=None):
    """Pad, stack and train a list of prepared folds as one fused program,
    sharded over the mesh's cell axis when a multi-device mesh is given."""
    from ..utils import rng as rng_util

    stacked = stack_folds(folds)
    valid_dim = stacked["x_labeled"].shape[-1]
    for k in ("x_labeled", "pool", "x_test"):
        stacked[k], _ = gan.pad_features(stacked[k], cfg.pad_multiple,
                                         cfg.pad_min)
    keys = rng_util.make_keys(rng.randint(2**31 - 1), len(folds))
    args = (
        keys,
        stacked["x_labeled"], stacked["y_labeled"], stacked["pool"],
        stacked["x_test"], stacked["y_test"], stacked["n_train"],
    )
    if mesh is not None and mesh.shape.get("cell", 1) > 1:
        from ..parallel import sweep

        return sweep.train_gan_work(*args, valid_dim=valid_dim, cfg=cfg,
                                    mesh=mesh)
    errors, _aux = gan.train_folds(*args, valid_dim=valid_dim, cfg=cfg)
    return np.asarray(errors)


def _loo_split(objects, held_out):
    """Host-side LOO split (used by the MLP/SVM baselines)."""
    x_test = np.asarray(objects[held_out]["x"])
    y_test = np.asarray(objects[held_out]["y"])
    x_train = np.concatenate(
        [np.asarray(objects[n]["x"]) for n in objects if n != held_out], 0
    )
    y_train = np.concatenate(
        [np.asarray(objects[n]["y"]) for n in objects if n != held_out], 0
    )
    return x_train, y_train, x_test, y_test


def run_gan_loo(objects, percentlabeled, cfg: gan.GanConfig = gan.GanConfig(),
                seed=0, mesh=None, chunk=None, on_result=None):
    """Leave-one-object-out protocol (mr_gan.py:263-283), fused + sharded.

    The reference trains the 72 LOO splits serially, rebuilding ~200 MB train
    arrays on host per split; every split has identical static shapes
    (train 7100 / test 100 / same labeled counts), so here they stack on a
    work axis, gather from the ONE device-resident copy of X, and run fused
    across the mesh in HBM-sized chunks.

    Returns (names, errors) in dict order; ``on_result(name, err)`` fires per
    object as each chunk completes.
    """
    rng = np.random.RandomState(seed)
    names = list(objects.keys())
    x_all = np.concatenate([np.asarray(objects[n]["x"]) for n in names], 0)
    y_all = np.concatenate([np.asarray(objects[n]["y"]) for n in names], 0)
    sizes = [len(objects[n]["y"]) for n in names]
    offs = np.cumsum([0] + sizes)
    ds = DeviceDataset(x_all, y_all, cfg.pad_multiple, mesh=mesh,
                       pad_min=cfg.pad_min)

    if chunk is None:
        chunk = loo_chunk(len(names), mesh)
    errors = []
    for block, idx, n_real in iter_loo_blocks(
            names, offs, ds.y_host, percentlabeled, cfg.num_classes, rng,
            chunk):
        errs = run_indexed_folds(ds, idx, cfg, rng, mesh=mesh)[:n_real]
        for i, e in zip(block, errs):
            errors.append(float(e))
            if on_result is not None:
                on_result(names[i], float(e))
    return names, np.asarray(errors)


def loo_chunk(n_names, mesh):
    """Work items per fused LOO launch: 6 per device.

    6 fits the 7100-row gathered pools in HBM and matches the k-fold-proven
    vmap width — wider launches (12) of the 100-epoch program crashed the
    remote TPU worker (probed: width 12 x epochs 100 fails, width 6 x 100
    and 12 x 1 succeed).
    """
    n_dev = mesh.shape["cell"] if mesh is not None else 1
    return min(n_names, 6 * n_dev)


def iter_loo_blocks(names, offs, y_host, percentlabeled, num_classes, rng,
                    chunk):
    """Shared leave-one-object-out block construction (mr_gan.py:263-283 /
    mr_nn.py:148-168 protocol): yields (block_object_indices, per-object
    fold_indices tuples padded to the chunk width, n_real)."""
    all_rows = np.arange(offs[-1])
    for s in range(0, len(names), chunk):
        block = list(range(s, min(s + chunk, len(names))))
        idx = []
        for i in block:
            test_idx = all_rows[offs[i] : offs[i + 1]]
            train_idx = np.concatenate(
                [all_rows[: offs[i]], all_rows[offs[i + 1] :]]
            )
            idx.append(
                fold_indices(y_host, train_idx, test_idx, percentlabeled,
                             None, num_classes, rng)
            )
        n_real = len(idx)
        while len(idx) < min(chunk, len(names)):  # pad short final chunk
            idx.append(idx[0])
        yield block, idx, n_real


def mr_gan(X, y, percentlabeled=50, percentunlabeled=None, epochs=None,
           trainTestSets=None, verbose=False, seed=None,
           cfg: gan.GanConfig = None):
    """Reference-API standalone training (mr_gan.py:73-88): one GAN training
    with an INTERNAL stratified split when ``trainTestSets`` is None
    (train_test_split(test_size=200*6, stratify=y)); returns the scalar test
    error. The table drivers use run_gan_cell directly — this exists for
    callers of the reference's ``mr_gan(X, y)`` function API.
    """
    from sklearn.model_selection import train_test_split

    if cfg is None:
        cfg = gan.GanConfig(epochs=100 if epochs is None else epochs)
    elif epochs is not None:
        # an explicit epochs always wins — previously it was silently
        # ignored whenever a cfg was also passed
        cfg = dataclasses.replace(cfg, epochs=epochs)
    if seed is None:
        # mr_gan.py:75 deliberately de-seeds ("Non Deterministic output")
        seed = np.random.randint(2**31 - 1)
    if trainTestSets is None:
        idx = np.arange(len(y))
        tr, te = train_test_split(idx, test_size=200 * cfg.num_classes,
                                  stratify=y, random_state=seed)
        x_all, y_all = np.asarray(X, np.float32), np.asarray(y, np.int32)
    else:
        x_train, x_test, y_train, y_test = trainTestSets
        x_all = np.concatenate([np.asarray(x_train, np.float32),
                                np.asarray(x_test, np.float32)])
        y_all = np.concatenate([np.asarray(y_train, np.int32),
                                np.asarray(y_test, np.int32)])
        tr = np.arange(len(y_train))
        te = np.arange(len(y_train), len(y_all))
    if verbose:
        print("Num of class examples in test set:",
              [int(np.sum(y_all[te] == i)) for i in range(cfg.num_classes)])
    errs = run_gan_cell(x_all, y_all, percentlabeled=percentlabeled,
                        percentunlabeled=percentunlabeled, cfg=cfg, seed=seed,
                        splits=[(tr, te)], verbose=verbose)
    return float(errs[0])
