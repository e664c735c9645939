"""WGAN-LP-CT semi-supervised trainer (others/wganlpctsemi.py:227-507).

The reference's TF/Keras variant combines, per discriminator step
(wganlpctsemi.py:346-378):

  loss = loss_lab + loss_unl + lamb * LipschitzPenalty + lamb2 * ConsistencyTerm

with the one-sided Lipschitz penalty of Petzka et al. on eps-mixed
real/fake inputs (:356-360), the CT-GAN consistency term between two dropout
passes of the discriminator (:361-368), and a plain -E[D(G(z))] generator
loss (:398). Adam(5e-4, beta1 0.5, beta2 0.9) shared across both updates
(:411), batch 64, 200 epochs (:270), discTrainIters/genTrainIters (:228).

TPU-native execution mirrors train.gan: one jitted scan-over-epochs/batches
program per fold, vmapped across folds. Deviation from the reference: the
final partial batch of each epoch (n_train % 64 rows, :475-487) is dropped to
keep shapes static — a <1% per-epoch data difference, statistically
invisible next to the de-seeded fold variance.
"""

import dataclasses
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import losses, nets, variant_nets as vnets
from ..train import gan as gan_mod
from ..train import optim, schedule


@dataclasses.dataclass(frozen=True)
class WganConfig:
    noise_size: int = 100       # wganlpctsemi.py:228
    batch_size: int = 64
    epochs: int = 200           # iwgan arch branch, wganlpctsemi.py:270
    lr: float = 5e-4            # wganlpctsemi.py:411
    beta1: float = 0.5
    beta2: float = 0.9
    lamb: float = 10.0          # Lipschitz penalty weight, wganlpctsemi.py:354
    lamb2: float = 2.0          # consistency-term weight, wganlpctsemi.py:355
    petzka_lp: bool = False     # False = the reference's (provably inert)
                                # normalize-then-hinge LP; True = the
                                # published Petzka et al. norm-hinged penalty
    ct_margin: float = 0.0      # CT-GAN margin M' (the reference uses 0)
    disc_iters: int = 1
    gen_iters: int = 1
    num_classes: int = 6
    arch: str = "resnet"        # 'resnet' = iwgan; 'lstm' = iwganlstm
    algo: str = "iwgan"         # loss family: 'iwgan'/'iwganlstm' (WGAN-LP-CT)
                                # or 'gan'/'ganlstm' (wganlpctsemi.py:340-345,
                                # 379-388: labeled loss with a fake softplus
                                # term, no penalties; generator matches batch
                                # means of the discriminator MID features
                                # ('gan') or OUTPUT logits ('ganlstm'))
    gen_hidden: int = 64        # 16 for iwganlstm (wganlpctsemi.py:300-304)
    disc_width: int = 128
    disc_blocks: int = 4
    lstm_units: int = 4         # wganlpctsemi.py:313
    dropout: float = 0.4
    pad_multiple: int = 128


def iwganlstm_config(**kw):
    """The reference's iwganlstm hyperparameters (wganlpctsemi.py:300-318,
    354, 414): biLSTM(4) discriminator, 16-wide generator, lamb=5, lr=1e-3."""
    return WganConfig(arch="lstm", algo="iwganlstm", gen_hidden=16, lamb=5.0,
                      lr=1e-3, **kw)


def ganlstm_config(**kw):
    """The 'ganlstm' algorithm (wganlpctsemi.py:384-388): the biLSTM
    discriminator arch with the gan-family labeled loss and a generator that
    feature-matches the batch means of the discriminator's OUTPUT logits.
    The reference file defines no optimizer or epochs for this branch (it
    predates the iwgan overrides and would hit its undefined
    `classification_loss`/`adam` names); this port completes it with the
    iwganlstm optimizer (Adam 1e-3, beta1 0.5, beta2 0.9) and the learnGAN
    default epochs=100 — documented as this repo's choice."""
    kw.setdefault("epochs", 100)
    return WganConfig(arch="lstm", algo="ganlstm", gen_hidden=16, lr=1e-3,
                      **kw)


def init_params(key, feat_dim, cfg: WganConfig):
    kg, kd = jax.random.split(key)
    if cfg.arch == "lstm":
        kd1, kd2 = jax.random.split(kd)
        disc = {
            "lstm": vnets.bilstm_init(kd1, 1, cfg.lstm_units),
            "out": nets.dense_init(kd2, 2 * cfg.lstm_units, cfg.num_classes),
        }
    else:
        disc = vnets.res_disc_init(kd, feat_dim, cfg.num_classes,
                                   cfg.disc_width, cfg.disc_blocks,
                                   cfg.dropout)
    return {
        "gen": vnets.small_generator_init(kg, cfg.noise_size, feat_dim,
                                          cfg.gen_hidden),
        "disc": disc,
    }


def _train_one(key, x_labeled, y_labeled, pool, x_test, y_test, *, n_train,
               cfg: WganConfig):
    feat_dim = x_labeled.shape[-1]
    n_lab = x_labeled.shape[0]
    n_pool = pool.shape[0]
    bs = cfg.batch_size
    nb = n_train // bs

    k_init, k_run = jax.random.split(key)
    params = init_params(k_init, feat_dim, cfg)
    # shared Keras Adam instance semantics (wganlpctsemi.py:414-416):
    # iteration counter advances once per disc AND once per gen update
    opt_d = optim.init(params["disc"], t0=-1)
    opt_g = optim.init(params["gen"])
    adam = partial(optim.update, lr=cfg.lr, b1=cfg.beta1, b2=cfg.beta2,
                   stride=2)

    if cfg.arch == "lstm":
        # biLSTM disc (wganlpctsemi.py:306-318): features as a scalar
        # sequence -> biLSTM(units) final state = mid -> Dense(K). No
        # dropout, so the key is unused (kept for a uniform signature).
        def disc_fwd(pd, x, k=None):
            mid = vnets.bilstm_apply(pd["lstm"], x[..., None],
                                     return_sequences=False)
            return nets.dense(pd["out"], mid), mid
    else:
        def disc_fwd(pd, x, k):
            return vnets.res_disc_apply(pd, x, k, train=True,
                                        blocks=cfg.disc_blocks,
                                        dropout_rate=cfg.dropout)

    def disc_step(pg, pd, od, inputs):
        xl, yl, xu, k = inputs
        k_z, k_eps, k_d1, k_d2, k_d3, k_mix, k_ct1, k_ct2, k_ctn = (
            jax.random.split(k, 9)
        )
        z = jax.random.normal(k_z, (bs, cfg.noise_size))
        x_fake = vnets.small_generator_apply(pg, z)
        # per-row eps repeated across features (wganlpctsemi.py:459)
        eps = jax.random.uniform(k_eps, (bs, 1))

        gan_family = cfg.algo in ("gan", "ganlstm")

        def d_loss(pd_):
            logits_lab, _ = disc_fwd(pd_, xl, k_d1)
            logits_fake, _ = disc_fwd(pd_, x_fake, k_d3)
            ll = losses.loss_labeled(logits_lab, yl)
            terr = losses.error_rate(logits_lab, yl)
            if gan_family:
                # wganlpctsemi.py:340-343: labeled loss + 0.5*softplus
                # fake term; no unlabeled loss, no LP/CT penalties
                from jax.scipy.special import logsumexp

                lf = 0.5 * jnp.mean(
                    jax.nn.softplus(logsumexp(logits_fake, axis=1)))
                return ll + lf, (ll, lf, terr)
            logits_unl, _ = disc_fwd(pd_, xu, k_d2)
            lu = losses.loss_unlabeled_wgan(logits_unl, logits_fake)
            gp = losses.lipschitz_penalty(
                lambda m: disc_fwd(pd_, m, k_mix)[0], xu, x_fake, eps,
                petzka=cfg.petzka_lp,
            )
            l1, m1 = disc_fwd(pd_, xu, k_ct1)
            l2, m2 = disc_fwd(pd_, xu, k_ct2)
            ct = losses.consistency_term(l1, l2, m1, m2, k_ctn,
                                         margin=cfg.ct_margin)
            return ll + lu + cfg.lamb * gp + cfg.lamb2 * ct, (ll, lu, terr)

        grads, aux = jax.grad(d_loss, has_aux=True)(pd)
        pd, od = adam(grads, od, pd)
        return pd, od, aux

    def gen_step(pg, pd, og, inputs):
        xu, k = inputs
        k_z, k_d, k_d2 = jax.random.split(k, 3)
        z = jax.random.normal(k_z, (bs, cfg.noise_size))

        def g_loss(pg_):
            xf = vnets.small_generator_apply(pg_, z)
            logits, mid = disc_fwd(pd, xf, k_d)
            if cfg.algo == "ganlstm":
                # wganlpctsemi.py:384-388: match batch means of the
                # discriminator's OUTPUT logits (no mid tap)
                logits_real, _ = disc_fwd(pd, xu, k_d2)
                return jnp.mean(jnp.square(jnp.mean(logits, 0)
                                           - jnp.mean(logits_real, 0)))
            if cfg.algo == "gan":
                # wganlpctsemi.py:379-383: Salimans feature matching on mid
                _, mid_real = disc_fwd(pd, xu, k_d2)
                return losses.loss_feature_matching(mid, mid_real)
            return -jnp.mean(logits)  # wganlpctsemi.py:398

        grads = jax.grad(g_loss)(pg)
        pg, og = adam(grads, og, pg)
        return pg, og

    def batch_step(carry, inputs):
        pg, pd, od, og = carry
        xl, yl, xu_d, xu_g, k = inputs
        k_d, k_g = jax.random.split(k)
        # disc_iters/gen_iters sub-batches (wganlpctsemi.py:455-472)
        for i in range(cfg.disc_iters):
            pd, od, aux = disc_step(
                pg, pd, od,
                (xl[i], yl[i], xu_d[i], jax.random.fold_in(k_d, i)),
            )
        for i in range(cfg.gen_iters):
            pg, og = gen_step(pg, pd, og,
                              (xu_g[i], jax.random.fold_in(k_g, i)))
        return (pg, pd, od, og), aux

    def epoch_body(carry, k_epoch):
        k_lab, k_u, k_g, k_steps = jax.random.split(k_epoch, 4)
        xl_e, yl_e, xu_d_e, xu_g_e = [], [], [], []
        for i in range(cfg.disc_iters):
            idx = schedule.tiled_permutation(
                jax.random.fold_in(k_lab, i), n_lab, n_train)[: nb * bs]
            xl_e.append(x_labeled[idx].reshape(nb, bs, feat_dim))
            yl_e.append(y_labeled[idx].reshape(nb, bs))
            uidx = jax.random.permutation(
                jax.random.fold_in(k_u, i), n_pool)[: nb * bs]
            xu_d_e.append(pool[uidx].reshape(nb, bs, feat_dim))
        for i in range(cfg.gen_iters):
            gidx = jax.random.permutation(
                jax.random.fold_in(k_g, i), n_pool)[: nb * bs]
            xu_g_e.append(pool[gidx].reshape(nb, bs, feat_dim))
        inputs = (
            jnp.stack(xl_e, 1), jnp.stack(yl_e, 1), jnp.stack(xu_d_e, 1),
            jnp.stack(xu_g_e, 1), jax.random.split(k_steps, nb),
        )
        carry, aux = jax.lax.scan(batch_step, carry, inputs)
        return carry, jax.tree.map(jnp.mean, aux)

    epoch_keys = jax.random.split(k_run, cfg.epochs)
    (pg, pd, od, og), _ = jax.lax.scan(
        epoch_body, (params["gen"], params["disc"], opt_d, opt_g), epoch_keys
    )
    if cfg.arch == "lstm":
        logits, _ = disc_fwd(pd, x_test)
    else:
        logits, _ = vnets.res_disc_apply(pd, x_test, train=False,
                                         blocks=cfg.disc_blocks)
    return losses.error_rate(logits, y_test)


@lru_cache(maxsize=32)
def _compiled(n_train, cfg):
    def one(key, xl, yl, pool, xt, yt):
        return _train_one(key, xl, yl, pool, xt, yt, n_train=n_train, cfg=cfg)

    return jax.jit(jax.vmap(one))


def train_folds(keys, x_labeled, y_labeled, pool, x_test, y_test, n_train,
                cfg: WganConfig = WganConfig()):
    """F folds of the WGAN-LP-CT cell as one fused program -> (F,) errors."""
    return _compiled(int(n_train), cfg)(keys, x_labeled, y_labeled, pool,
                                        x_test, y_test)


def run_wgan_cell(x, y, percent_labeled=1.0, cfg: WganConfig = WganConfig(),
                  seed=0, n_splits=6):
    """Stratified k-fold WGAN-LP-CT cell (the learnGAN protocol,
    wganlpctsemi.py:573-576). ``percent_labeled`` is a FRACTION (the variant
    uses fractions, not the main scripts' percents). Returns fold errors."""
    from ..train import protocol

    rng = np.random.RandomState(seed)
    splits = protocol.stratified_splits(y, n_splits=n_splits, seed=seed)
    folds = []
    for tr, te in splits:
        x_tr, x_te = protocol.scale_fold(
            np.asarray(x[tr], np.float32), np.asarray(x[te], np.float32)
        )
        y_tr = np.asarray(y[tr], np.int32)
        perm = rng.permutation(len(x_tr))
        x_tr, y_tr = x_tr[perm], y_tr[perm]
        # fraction-of-class labeled selection (wganlpctsemi.py:240-242)
        xs, ys = [], []
        for j in range(cfg.num_classes):
            n_j = int((y_tr == j).sum() * percent_labeled)
            xs.append(x_tr[y_tr == j][:n_j])
            ys.append(np.full(n_j, j, np.int32))
        folds.append({
            "x_labeled": np.concatenate(xs), "y_labeled": np.concatenate(ys),
            "pool": x_tr, "x_test": x_te,
            "y_test": np.asarray(y[te], np.int32), "n_train": len(x_tr),
        })
    stacked = protocol.stack_folds(folds)
    for k in ("x_labeled", "pool", "x_test"):
        stacked[k], _ = gan_mod.pad_features(stacked[k], cfg.pad_multiple)
    from ..utils import rng as rng_util

    keys = rng_util.make_keys(rng.randint(2**31 - 1), len(folds))
    errs = train_folds(keys, stacked["x_labeled"], stacked["y_labeled"],
                       stacked["pool"], stacked["x_test"], stacked["y_test"],
                       stacked["n_train"], cfg=cfg)
    return np.asarray(errs)
