"""Keras-2.0.9-semantics Adam.

The reference trains with ``Adam(lr=0.0006, beta_1=0.5)`` (mr_gan.py:165).
Keras 2.0.9 applies bias correction through the learning rate and adds eps
*outside* the sqrt of the raw second moment:

    lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
    p   -= lr_t * m / (sqrt(v) + eps)

which differs (negligibly, but we pin it anyway) from optax.adam's
mhat/(sqrt(vhat)+eps). Implemented as a ~20-line pytree transform so it is
trivially vmappable over fold/sweep axes.
"""

import numpy as np

import jax
import jax.numpy as jnp


class CarryPack:
    """Relayout a scan carry so every sub-matrix leaf (biases, BN scales,
    Adam moments of those, step counters) lives in ONE flat buffer per dtype
    instead of dozens of tiny arrays.

    Motivation (v5e profile): the fused GAN step's big Adam/matmul fusions
    stream at HBM roofline, but ~0.6 ms/step of scheduler stall remains
    around the many small per-iteration copy-starts of the scan carry's
    little buffers. Packing is a pure relayout — ravel + concatenate on the
    way in, static slices + reshape on the way out — so the training math is
    BITWISE identical (tested); XLA fuses the slices into their consumers
    and emits the concatenate from the update fusions' epilogues.

    Matrix leaves (ndim >= 2 by default) keep their own buffers: they are
    already large, and repacking them would add full-size copies to the
    roofline-bound path.
    """

    def __init__(self, tree, keep=lambda a: a.ndim >= 2):
        leaves, self.treedef = jax.tree.flatten(tree)
        self.keep = [bool(keep(l)) for l in leaves]
        self.shapes = [tuple(l.shape) for l in leaves]
        self.sizes = [int(np.prod(s, dtype=np.int64)) for s in self.shapes]
        dtypes = [jnp.dtype(l.dtype) for l in leaves]
        self.groups = {}  # dtype name -> leaf indices, deterministic order
        for i, (k, dt) in enumerate(zip(self.keep, dtypes)):
            if not k:
                self.groups.setdefault(dt.name, []).append(i)
        self.group_names = sorted(self.groups)

    def pack(self, tree):
        leaves = jax.tree.leaves(tree)
        kept = [l for l, k in zip(leaves, self.keep) if k]
        vecs = [jnp.concatenate([leaves[i].ravel()
                                 for i in self.groups[name]])
                for name in self.group_names]
        return (*kept, *vecs)

    def unpack(self, packed):
        n_kept = sum(self.keep)
        leaves = [None] * len(self.keep)
        it = iter(packed[:n_kept])
        for i, k in enumerate(self.keep):
            if k:
                leaves[i] = next(it)
        for name, vec in zip(self.group_names, packed[n_kept:]):
            off = 0
            for i in self.groups[name]:
                n = self.sizes[i]
                leaves[i] = vec[off : off + n].reshape(self.shapes[i])
                off += n
        return jax.tree.unflatten(self.treedef, leaves)


def mm_shadow(params):
    """bf16 shadow of the weight MATRICES (vectors — biases, BN scales —
    stay f32). The trainers (train.gan / train.mlp) hold this alongside the
    f32 masters in their scan carries and run every matmul pass off it:
    bitwise-identical on the MXU (DEFAULT-precision f32 dots truncate
    operands to bf16 per pass anyway) at half the weight-streaming bytes.
    Refreshing it immediately after the Adam update lets XLA emit it from
    the Adam fusion's output epilogue."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.ndim == 2 else a, params)


def init(params, state_dtype=None, t0=0):
    """Adam state. ``state_dtype`` (e.g. jnp.bfloat16) stores the moment
    buffers at reduced precision: profiled on v5e the fused GAN step is
    HBM-bound on optimizer-state streaming, and bf16 moments cut that traffic
    by a third. Moment math still runs in f32 (cast on load/store).

    ``t0``/``stride`` (in ``update``) reproduce the reference's SHARED Adam
    instance: one Keras optimizer serves both the discriminator and generator
    updates (mr_gan.py:165-167), so its `iterations` counter advances by 2
    per batch — the disc update runs bias correction at t = 1, 3, 5, ... and
    the gen update at t = 2, 4, 6, ... Use init(t0=-1)/update(stride=2) for
    the disc and init(t0=0)/update(stride=2) for the gen."""
    def zeros(p):
        return jnp.zeros(p.shape, state_dtype or p.dtype)

    return {
        "m": jax.tree.map(zeros, params),
        "v": jax.tree.map(zeros, params),
        "t": jnp.asarray(t0, jnp.int32),
    }


def update(grads, state, params, lr=6e-4, b1=0.5, b2=0.999, eps=1e-8,
           stride=1):
    t = state["t"] + stride
    tf = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - jnp.power(b2, tf)) / (1.0 - jnp.power(b1, tf))

    def upd_m(m_, g):
        return (b1 * m_.astype(jnp.float32)
                + (1.0 - b1) * g.astype(jnp.float32)).astype(m_.dtype)

    def upd_v(v_, g):
        g32 = g.astype(jnp.float32)  # square in f32 even for bf16-staged grads
        return (b2 * v_.astype(jnp.float32)
                + (1.0 - b2) * g32 * g32).astype(v_.dtype)

    m = jax.tree.map(upd_m, state["m"], grads)
    v = jax.tree.map(upd_v, state["v"], grads)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr_t * m_.astype(jnp.float32)
        / (jnp.sqrt(v_.astype(jnp.float32)) + eps),
        params, m, v,
    )
    return new_params, {"m": m, "v": v, "t": t}
