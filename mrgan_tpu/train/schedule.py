"""Device-side epoch batch schedules.

The reference builds, per epoch and per pool, an index vector of length
n_train by concatenating full permutations of the pool plus one permutation
of the remainder range (mr_gan.py:189-202). Reproduced here with
jax.random so the whole epoch schedule is generated on device inside the
jitted training loop — no host round-trips between the 24k kernel launches
the reference makes per training.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("pool_size", "n_out"))
def tiled_permutation(key, pool_size, n_out):
    """Concat of ceil-tiled permutations of [0, pool_size), reference
    semantics: full perms for n_out // pool_size repeats, then a permutation
    of range(n_out % pool_size) — note the remainder permutes the *first*
    ``rem`` pool entries, exactly as np.random.permutation(rem) does."""
    reps = n_out // pool_size
    rem = n_out % pool_size
    keys = jax.random.split(key, reps + 1)
    if reps > 0:
        perms = jax.vmap(lambda k: jax.random.permutation(k, pool_size))(keys[:reps])
        parts = [perms.reshape(-1)]
    else:
        parts = []
    if rem > 0:
        parts.append(jax.random.permutation(keys[-1], rem))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]
