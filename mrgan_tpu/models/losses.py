"""Semi-supervised GAN losses (Salimans et al. 2016 feature matching).

Pure-function transcription of the symbolic losses at mr_gan.py:146-158 and
the WGAN-LP-CT variants at others/wganlpctsemi.py:340-399. Each function takes
logits/features and returns a scalar, so the same code path is used under
grad, vmap (fold axis) and shard_map (sweep/data axes).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def loss_labeled(logits_lab, labels):
    """-E[logit_y] + E[logsumexp(logits)]  (mr_gan.py:146-148).

    Equals standard cross-entropy of the K-class softmax on labeled data.
    """
    label_lab = jnp.take_along_axis(logits_lab, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(label_lab) + jnp.mean(logsumexp(logits_lab, axis=1))


def loss_unlabeled(logits_unl, logits_fake):
    """0.5*(-E[lse(unl)] + E[softplus(lse(unl))] + E[softplus(lse(fake))])
    (mr_gan.py:149): push D(x) real for unlabeled data, fake for generated.
    """
    lse_unl = logsumexp(logits_unl, axis=1)
    lse_fake = logsumexp(logits_fake, axis=1)
    return (
        -0.5 * jnp.mean(lse_unl)
        + 0.5 * jnp.mean(jax.nn.softplus(lse_unl))
        + 0.5 * jnp.mean(jax.nn.softplus(lse_fake))
    )


def loss_feature_matching(mid_fake, mid_real, axis_name=None):
    """||E[f(G(z))] - E[f(x_unl)]||^2 / dim  (mr_gan.py:152-154).

    ``axis_name``: data-parallel mesh axis. The loss is *nonlinear* in the
    batch expectations, so under DP the feature means must be pmean'd across
    shards BEFORE the square — per-shard losses averaged afterwards would be a
    different objective.
    """
    mom_gen = jnp.mean(mid_fake, axis=0)
    mom_real = jnp.mean(mid_real, axis=0)
    if axis_name is not None:
        mom_gen = jax.lax.pmean(mom_gen, axis_name)
        mom_real = jax.lax.pmean(mom_real, axis_name)
    return jnp.mean(jnp.square(mom_gen - mom_real))


def error_rate(logits, labels):
    """mean(argmax(logits) != labels) (mr_gan.py:161-162)."""
    return jnp.mean(jnp.argmax(logits, axis=1) != labels)


# --------------------------------------------------------------------------
# WGAN-LP-CT variant losses (others/wganlpctsemi.py)
# --------------------------------------------------------------------------

def loss_unlabeled_wgan(logits_unl, logits_fake):
    """Unweighted variant at wganlpctsemi.py:374."""
    lse_unl = logsumexp(logits_unl, axis=1)
    lse_fake = logsumexp(logits_fake, axis=1)
    return (
        -jnp.mean(lse_unl)
        + jnp.mean(jax.nn.softplus(lse_unl))
        + jnp.mean(jax.nn.softplus(lse_fake))
    )


def lipschitz_penalty(disc_fn, x_real, x_fake, eps, petzka=False):
    """WGAN-LP one-sided gradient penalty (wganlpctsemi.py:356-360).

    The reference L2-NORMALIZES the gradient per row and then hinges its
    COMPONENTS at 1 — but every component of a unit vector is <= 1, so the
    reference's penalty is identically zero with zero gradient: the
    Lipschitz constraint in its iwgan runs was inert (its commented-out
    ``K.square(gradientMixedNorm - 1.0)`` line would have been active).
    ``petzka=False`` pins that semantic exactly — returning the constant 0
    the formula provably evaluates to, without paying the extra
    forward/backward. ``petzka=True`` implements the penalty as published
    (Petzka et al.: hinge the gradient NORM), for runs that want a working
    Lipschitz constraint.
    """
    mixed = eps * x_real + (1.0 - eps) * x_fake
    if not petzka:
        # reference semantics: max(0, unit_vector_component - 1) == 0 always
        return jnp.zeros((), mixed.dtype)
    grad = jax.grad(lambda m: jnp.mean(disc_fn(m)))(mixed)
    norm = jnp.sqrt(
        jnp.maximum(jnp.sum(jnp.square(grad), axis=1), 1e-24))
    return jnp.mean(jnp.square(jnp.maximum(0.0, norm - 1.0)))


def consistency_term(logits1, logits2, mid1, mid2, key, stddev=1e-4,
                     margin=0.0):
    """CT-GAN consistency term (wganlpctsemi.py:361-368): distance between two
    noisy discriminator passes on the same unlabeled batch.

    The reference hinges at zero — i.e. it dropped CT-GAN's margin M', so
    its max(0, ct) never clips (ct is a sum of L2 distances, >= 0 by
    construction) and ALL discriminator stochasticity is penalized. margin=0
    pins that; pass margin=M' for the published CT-GAN form."""
    k1, k2 = jax.random.split(key)
    d2 = logits2 + stddev * jax.random.normal(k1, logits2.shape, logits2.dtype)
    m2 = mid2 + stddev * jax.random.normal(k2, mid2.shape, mid2.dtype)

    def l2d(a, b):
        return jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(a - b), axis=-1), 1e-24))

    ct = l2d(jax.nn.softmax(logits1, axis=-1), jax.nn.softmax(d2, axis=-1)) + 0.1 * l2d(
        mid1, m2
    )
    return jnp.mean(jnp.maximum(0.0, ct - margin))
