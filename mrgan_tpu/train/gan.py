"""Fused semi-supervised GAN training.

The reference's training (mr_gan.py:183-228) is a host-driven loop making
~24,000 device calls per training (100 epochs x 120 batches x 2 updates) with
numpy batch slicing in between. Here one training = ONE jitted computation:

    lax.scan over epochs
      -> device-side permutation schedules (train.schedule)
      -> lax.scan over batches
           -> discriminator Adam step (labeled + unlabeled + fake losses)
           -> generator Adam step (feature matching) against the *updated*
              discriminator (the reference's sequential K.function semantics)

and six folds run together under vmap, so a whole table sweep cell is a single
XLA program with zero host round-trips.

Feature dims are padded to an MXU-friendly multiple (lane width 128); padded
columns are kept exactly inert by masking the discriminator's input noise and
the generator's output, which preserves bit-level equivalence of the math with
the unpadded model (zero inputs -> zero gradients -> frozen dead weights).
"""

import dataclasses
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import losses, nets
from ..ops import scaler
from . import optim, schedule


@dataclasses.dataclass(frozen=True)
class GanConfig:
    noise_size: int = 100          # mr_gan.py:77
    batch_size: int = 50           # mr_gan.py:78
    unlabeled_weight: float = 1.0  # mr_gan.py:79
    epochs: int = 100              # mr_gan.py:73
    lr: float = 6e-4               # mr_gan.py:165
    beta1: float = 0.5
    num_classes: int = 6
    pad_multiple: int = 128        # TPU lane width; 1 disables padding
    pad_min: int = 0               # bucket feature width up to a proven-safe
                                   # minimum (see pad_features); 0 disables
    track_epoch_metrics: bool = False
    opt_state_dtype: str = "bfloat16"
    # The fused step is HBM-bound on Adam-state streaming; bf16 moments cut
    # that traffic by a third (+17% steps/s measured on v5e) with moment math
    # still in f32. Full-scale validation: 97.1%/92.2% acc (100%/4% labels)
    # vs 96.7%/88.7% with f32 state — no degradation. Set "float32" to pin
    # exact reference-optimizer numerics.
    shared_adam_step: bool = True
    # The reference shares one Keras Adam across disc+gen updates
    # (mr_gan.py:165-167): its iteration counter advances by 2 per batch, so
    # bias correction sees t = 1,3,5,... (disc) / 2,4,6,... (gen). True pins
    # that semantic (a SURVEY §7 "small semantic trap").
    flat_small_carry: bool = True
    # Pack every sub-matrix scan-carry leaf (biases/BN/moments/counters)
    # into one flat buffer per dtype (optim.CarryPack): bitwise-identical
    # relayout targeting the profiled per-step copy-start stall around many
    # small carry buffers. Default ON since the v5e A/B confirmed the win
    # (3033 vs 2936 updates/s, round 2); bitwise identity is pinned by
    # tests/test_gan_train.py::test_flat_small_carry_bitwise_identical and
    # on hardware by tools/check_flat_carry.py.
    matmul_weight_dtype: str = "bfloat16"
    # "bfloat16" streams the weight MATRICES through bf16 shadow copies for
    # every matmul pass (fwd + bwd, disc + gen), refreshed inside the Adam
    # fusion each step; the f32 masters only feed Adam. On the MXU a
    # DEFAULT-precision f32 dot truncates operands to bf16 per pass anyway,
    # so the forward/backward dots are BITWISE-IDENTICAL (verified on v5e) —
    # the only numeric delta is weight-gradients rounding to bf16 before the
    # (f32) Adam math, the same order as the validated bf16 moment buffers.
    # The fused step is HBM-bound on weight streaming; this halves the bytes
    # of 4 of the 6 big-matrix passes per step. "float32" restores exact
    # f32 gradient staging.

    @property
    def opt_dtype(self):
        import jax.numpy as _jnp

        return {"float32": _jnp.float32,
                "bfloat16": _jnp.bfloat16}[self.opt_state_dtype]


def pad_dim(d, multiple, min_dim=0):
    # min_dim is rounded up to the lane multiple too: a --pad-min that is not
    # itself a multiple must not reintroduce the misaligned widths the
    # bucketing exists to avoid.
    return -(-max(d, min_dim) // multiple) * multiple


def pad_features(x, multiple=128, min_dim=0):
    """Zero-pad feature columns to a lane-aligned width >= min_dim.
    Returns (x_pad, D).

    ``min_dim`` buckets narrow feature matrices up to a proven-safe width:
    certain narrow widths (observed: 640) trigger a deterministic TPU
    backend fault in the fused trainer on this stack, while the Table 1/3/6
    widths (1280/3712-class) are proven over thousands of trainings. Padding
    is exactly inert (masked noise/output — see module docstring and
    tests/test_gan_train.py pad-equivalence), so bucketing trades a few
    dead columns for one compiled program per bucket and no faults.

    Minimal repro + disposition: tools/repro_narrow_fault.py (one command,
    subprocess-isolated, optional HLO dump; docs/NARROW_FAULT.md records
    the observed crash signature per toolchain). Retire this bucket when
    that tool reports width 640 passing.
    """
    d = x.shape[-1]
    dp = pad_dim(d, multiple, min_dim)
    if dp == d:
        return x, d
    pad = [(0, 0)] * (x.ndim - 1) + [(0, dp - d)]
    return np.pad(np.asarray(x), pad), d


def init_params(key, feat_dim, cfg: GanConfig):
    kg, kd = jax.random.split(key)
    return {
        "gen": nets.generator_init(kg, cfg.noise_size, feat_dim),
        "disc": nets.discriminator_init(kd, feat_dim, cfg.num_classes),
    }


def _masks(feat_dim, valid_dim):
    if valid_dim >= feat_dim:
        return None
    # Static -> embedded as an XLA constant
    return (np.arange(feat_dim) < valid_dim).astype(np.float32)


# See GanConfig.matmul_weight_dtype; kept as a module alias since both
# trainers and tests reference the mechanism through their trainer module.
_mm_shadow = optim.mm_shadow


def _train_one(key, x_labeled, y_labeled, pool, x_test, y_test,
               *, n_train, valid_dim, cfg: GanConfig, n_pool_valid=None,
               dp_axis=None, dp_size=1):
    """Train a single GAN cell end-to-end; returns (test_error, metrics).

    ``n_pool_valid``: when the pool array is padded to a uniform row count
    (see _train_one_indexed), only its first n_pool_valid rows are real; the
    batch schedule samples exclusively from them.

    ``dp_axis``/``dp_size``: run the whole epoch-scan trainer data-parallel
    inside a shard_map over that mesh axis (parallel.spmd.train_gan_cell_dp).
    Data arrays arrive replicated; each shard computes its bs/dp_size rows of
    every batch, with the three DP collectives the math requires (gradient
    pmean, cross-shard generator-BN stats, feature-matching moments pmean'd
    before the square — see parallel/spmd.py). All stochastic tensors are
    drawn for the GLOBAL batch and sliced per shard, so the DP trajectory
    reproduces the single-device step exactly (up to f32 reduction order).
    """
    feat_dim = x_labeled.shape[-1]
    n_lab = x_labeled.shape[0]
    n_pool = n_pool_valid if n_pool_valid is not None else pool.shape[0]
    bs = cfg.batch_size
    nb = n_train // bs
    mask = _masks(feat_dim, valid_dim)
    if dp_axis is not None:
        if bs % dp_size:
            raise ValueError(
                f"batch_size {bs} not divisible by data-axis size {dp_size}")
        bsl = bs // dp_size
        rank = jax.lax.axis_index(dp_axis)
        local_rows = rank * bsl + jnp.arange(bsl)
        # local rows of the fused 3-section disc batch [lab | unl | fake]
        # within the (3*bs)-row global batch
        rows3 = jnp.concatenate(
            [s * bs + local_rows for s in range(3)])
        # local rows of the 2-section gen batch [fake | unl]
        rows2 = jnp.concatenate(
            [s * bs + local_rows for s in range(2)])
    else:
        bsl = bs
        local_rows = rows3 = rows2 = None

    k_init, k_run = jax.random.split(key)
    params = init_params(k_init, feat_dim, cfg)
    stride = 2 if cfg.shared_adam_step else 1
    opt_d = optim.init(params["disc"], cfg.opt_dtype,
                       t0=-1 if cfg.shared_adam_step else 0)
    opt_g = optim.init(params["gen"], cfg.opt_dtype)

    adam = partial(optim.update, lr=cfg.lr, b1=cfg.beta1, stride=stride)

    def disc_fwd(pd, x, k, noise_rows=None, noise_index=None):
        return nets.discriminator_apply(pd, x, k, train=True, in_mask=mask,
                                        noise_rows=noise_rows,
                                        noise_index=noise_index)

    def _pmean_f32(tree):
        return jax.lax.pmean(
            jax.tree.map(lambda a: a.astype(jnp.float32), tree), dp_axis)

    use_sh = cfg.matmul_weight_dtype == "bfloat16"

    def batch_step(carry, inputs):
        """One fused disc+gen update (mr_gan.py:204-213 semantics).

        The reference forwards the discriminator on labeled / unlabeled /
        fake batches separately; since its GaussianNoise draws are iid per
        element, the three passes are fused into ONE concatenated forward
        (3*bs rows) — identical in distribution, 3x fewer RNG draws, and a
        3x-taller M for the MXU. Same for the two generator-loss passes.

        With matmul_weight_dtype="bfloat16" the carry additionally holds
        bf16 shadows of both parameter trees; all dots run off the shadows
        (bitwise-identical to the f32 dots — the MXU truncates either way)
        and gradients are taken w.r.t. the shadows, feeding the f32 masters'
        Adam update.
        """
        if use_sh:
            pg, pd, od, og, pg_sh, pd_sh = carry
        else:
            pg, pd, od, og = carry
            pg_sh, pd_sh = pg, pd
        li, ui, u2i, k = inputs
        if dp_axis is not None:
            # this shard's bs/dp_size rows of the global batch schedule
            li, ui, u2i = (jnp.take(a, local_rows) for a in (li, ui, u2i))
        # Gather this batch's rows here, inside the scan step, rather than
        # materializing whole-epoch (nb, bs, D) batch tensors in epoch_body:
        # same indices -> identical math, but HBM sees one read of bs rows
        # per step instead of a write+read of the full epoch copy (the fused
        # step is HBM-bound), and the multi-hundred-MB transients vanish —
        # at the Table-5 audio widths (D=12032) those transients were enough
        # to crash the worker.
        xl = x_labeled[li]
        yl = y_labeled[li]
        xu = pool[ui]
        xu2 = pool[u2i]
        k_z1, k_z2, k_d, k_g = jax.random.split(k, 4)

        # --- discriminator update (mr_gan.py:166,169; train_batch_disc) ---
        z1 = jax.random.normal(k_z1, (bs, cfg.noise_size))
        if dp_axis is not None:
            z1 = jnp.take(z1, local_rows, axis=0)  # global draw, local rows
        x_fake = nets.generator_apply(pg_sh, z1, out_mask=mask,
                                      axis_name=dp_axis)

        def d_loss(pd_):
            logits, _ = disc_fwd(pd_, jnp.concatenate([xl, xu, x_fake]), k_d,
                                 noise_rows=3 * bs if dp_axis else None,
                                 noise_index=rows3)
            logits_lab, logits_unl, logits_fake = jnp.split(logits, 3)
            ll = losses.loss_labeled(logits_lab, yl)
            lu = losses.loss_unlabeled(logits_unl, logits_fake)
            terr = losses.error_rate(logits_lab, yl)
            return ll + cfg.unlabeled_weight * lu, (ll, lu, terr)

        d_grads, (ll, lu, terr) = jax.grad(d_loss, has_aux=True)(pd_sh)
        if dp_axis is not None:
            # per-shard mean-loss grads pmean'd = global-batch grads; f32
            # reduction so the (validated) bf16 shadow-grad rounding isn't
            # compounded by a low-precision allreduce
            d_grads = _pmean_f32(d_grads)
            ll, lu, terr = jax.lax.pmean((ll, lu, terr), dp_axis)
        pd, od = adam(d_grads, od, pd)
        if use_sh:
            pd_sh = _mm_shadow(pd)
        else:
            pd_sh = pd

        # --- generator update against the updated discriminator ---
        z2 = jax.random.normal(k_z2, (bs, cfg.noise_size))
        if dp_axis is not None:
            z2 = jnp.take(z2, local_rows, axis=0)

        def g_loss(pg_):
            xf = nets.generator_apply(pg_, z2, out_mask=mask,
                                      axis_name=dp_axis)
            _, mid = disc_fwd(pd_sh, jnp.concatenate([xf, xu2]), k_g,
                              noise_rows=2 * bs if dp_axis else None,
                              noise_index=rows2)
            mid_fake, mid_real = jnp.split(mid, 2)
            return losses.loss_feature_matching(mid_fake, mid_real,
                                                axis_name=dp_axis)

        g_grads = jax.grad(g_loss)(pg_sh)
        if dp_axis is not None:
            g_grads = _pmean_f32(g_grads)
        pg, og = adam(g_grads, og, pg)
        if use_sh:
            pg_sh = _mm_shadow(pg)
            return (pg, pd, od, og, pg_sh, pd_sh), (ll, lu, terr)
        return (pg, pd, od, og), (ll, lu, terr)

    carry0 = (params["gen"], params["disc"], opt_d, opt_g)
    if use_sh:
        carry0 += (_mm_shadow(params["gen"]), _mm_shadow(params["disc"]))
    if cfg.flat_small_carry:
        packer = optim.CarryPack(carry0)
        carry0 = packer.pack(carry0)

        def scan_step(carry_p, inputs):
            carry, out = batch_step(packer.unpack(carry_p), inputs)
            return packer.pack(carry), out
    else:
        packer = None
        scan_step = batch_step

    def epoch_body(carry, k_epoch):
        k_lab, k_u1, k_u2, k_steps = jax.random.split(k_epoch, 4)
        lab_idx = schedule.tiled_permutation(k_lab, n_lab, n_train)[: nb * bs]
        u1_idx = schedule.tiled_permutation(k_u1, n_pool, n_train)[: nb * bs]
        u2_idx = schedule.tiled_permutation(k_u2, n_pool, n_train)[: nb * bs]
        step_keys = jax.random.split(k_steps, nb)
        carry, (ll, lu, terr) = jax.lax.scan(
            scan_step, carry,
            (lab_idx.reshape(nb, bs), u1_idx.reshape(nb, bs),
             u2_idx.reshape(nb, bs), step_keys),
        )
        out = (jnp.mean(ll), jnp.mean(lu), jnp.mean(terr))
        if cfg.track_epoch_metrics:
            # per-epoch test pass (mr_gan.py:221-223; its batch mean over the
            # exactly-covering 50-row test batches equals the full-set mean)
            pd_e = (packer.unpack(carry) if packer else carry)[1]
            logits_e, _ = nets.discriminator_apply(pd_e, x_test, train=False)
            out += (losses.error_rate(logits_e, y_test),)
        return carry, out

    epoch_keys = jax.random.split(k_run, cfg.epochs)
    carry, metrics = jax.lax.scan(epoch_body, carry0, epoch_keys)
    if packer is not None:
        carry = packer.unpack(carry)
    pg, pd, od, og = carry[:4]

    # Final full-test-set evaluation, eval phase (mr_gan.py:230)
    logits, _ = nets.discriminator_apply(pd, x_test, train=False)
    test_error = losses.error_rate(logits, y_test)
    out_metrics = (
        {"loss_lab": metrics[0], "loss_unl": metrics[1],
         "train_err": metrics[2], "test_err": metrics[3]}
        if cfg.track_epoch_metrics
        else {}
    )
    return test_error, {"params": {"gen": pg, "disc": pd}, **out_metrics}


def scale_stats(x_train):
    """StandardScaler fit as pure ops: population mean/std, constant columns
    pass through (sklearn semantics, mr_gan.py:96-98).

    NEAR-constant columns pass through too; the guard and its rationale
    live in ops.scaler (the single canonical implementation). Returns
    (mean, 1/scale) — the trainer multiplies rather than divides."""
    mean, scale = scaler.fit(x_train)
    return mean, 1.0 / scale


def _train_one_indexed(key, X, y, lab_idx, pool_idx, train_idx, test_idx,
                       *, valid_dim, cfg: GanConfig, n_pool_valid=None,
                       dp_axis=None, dp_size=1):
    """Device-side fold prep + training: the whole cell reads only the
    HBM-resident dataset X plus tiny index vectors.

    The reference re-runs StandardScaler + labeled selection on host numpy
    for every one of its hundreds of sweep cells (mr_gan.py:96-103), shipping
    the full fold arrays to the device each time. Here X is uploaded once per
    modality; scaling stats, gathers and selection happen on device inside
    the jitted program, so a sweep cell costs a few KB of host->device
    traffic instead of ~1 GB.
    """
    x_train = X[train_idx]
    mean, inv = scale_stats(x_train)

    def scale(a):
        return (a - mean) * inv

    return _train_one(
        key,
        scale(X[lab_idx]), y[lab_idx],
        scale(X[pool_idx]),
        scale(X[test_idx]), y[test_idx],
        n_train=train_idx.shape[0], valid_dim=valid_dim, cfg=cfg,
        n_pool_valid=n_pool_valid, dp_axis=dp_axis, dp_size=dp_size,
    )


@lru_cache(maxsize=64)
def _compiled_indexed_trainer(shapes, valid_dim, cfg, n_pool_valid,
                              with_metrics=False):
    """jit(vmap(train_one_indexed)); X and y broadcast across the fold axis."""

    def one(key, X, y, lab_idx, pool_idx, train_idx, test_idx):
        err, aux = _train_one_indexed(key, X, y, lab_idx, pool_idx, train_idx,
                                      test_idx, valid_dim=valid_dim, cfg=cfg,
                                      n_pool_valid=n_pool_valid)
        if with_metrics:
            return err, {k: v for k, v in aux.items() if k != "params"}
        return err

    return jax.jit(jax.vmap(one, in_axes=(0, None, None, 0, 0, 0, 0)))


def pad_pool_indices(pool_idx, train_idx):
    """Pad the unlabeled-pool index array to the train width.

    Uniform pool shapes mean every unlabeled-grid cell shares one compiled
    program, and they dodge an observed Mosaic/TPU codegen fault on certain
    intermediate gather row counts (2160/2176/2304 rows crashed the worker;
    the n_train shape is the production-proven path). Padding rows repeat
    index 0 and are never sampled (n_pool_valid bounds the schedule).
    Returns (padded_pool_idx, n_pool_valid or None).
    """
    n_pool = pool_idx.shape[-1]
    n_train = train_idx.shape[-1]
    if n_pool >= n_train:
        return pool_idx, None
    pad = np.repeat(pool_idx[..., :1], n_train - n_pool, axis=-1)
    return np.concatenate([pool_idx, pad], axis=-1), n_pool


def train_folds_indexed(keys, X, y, lab_idx, pool_idx, train_idx, test_idx,
                        valid_dim=None, cfg: GanConfig = GanConfig(),
                        with_metrics=False):
    """Train F folds against a device-resident dataset.

    Args:
      X: (N, D) padded feature matrix (device-resident; uploaded once).
      y: (N,) int32 labels.
      lab_idx/pool_idx/train_idx/test_idx: (F, *) int32 row indices into X.
    Returns (F,) test errors; with ``with_metrics`` (requires
    cfg.track_epoch_metrics) returns (errors, {metric: (F, epochs)}).
    """
    if valid_dim is None:
        valid_dim = X.shape[-1]
    pool_idx, n_pool_valid = pad_pool_indices(np.asarray(pool_idx),
                                              np.asarray(train_idx))
    shapes = (lab_idx.shape[-1], pool_idx.shape[-1], train_idx.shape[-1],
              test_idx.shape[-1])
    fn = _compiled_indexed_trainer(shapes, int(valid_dim), cfg, n_pool_valid,
                                   with_metrics)
    return fn(keys, X, y, lab_idx, pool_idx, train_idx, test_idx)


@lru_cache(maxsize=64)
def _compiled_fold_trainer(n_train, valid_dim, cfg, with_params):
    """jit(vmap(train_one)) specialised to a cell's static shapes."""

    def one(key, x_labeled, y_labeled, pool, x_test, y_test):
        err, aux = _train_one(
            key, x_labeled, y_labeled, pool, x_test, y_test,
            n_train=n_train, valid_dim=valid_dim, cfg=cfg,
        )
        if not with_params:
            aux = {k: v for k, v in aux.items() if k != "params"}
        return err, aux

    return jax.jit(jax.vmap(one))


def train_folds(keys, x_labeled, y_labeled, pool, x_test, y_test, n_train,
                valid_dim=None, cfg: GanConfig = GanConfig(), with_params=False):
    """Train F folds of one sweep cell as a single fused XLA program.

    All array args carry a leading fold axis F; shapes must match across folds
    (guaranteed by the stratified splits). Returns (test_errors (F,), aux).
    """
    if valid_dim is None:
        valid_dim = x_labeled.shape[-1]
    fn = _compiled_fold_trainer(int(n_train), int(valid_dim), cfg, with_params)
    return fn(keys, x_labeled, y_labeled, pool, x_test, y_test)
