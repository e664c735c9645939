"""Optional tensor parallelism over a "model" mesh axis.

SURVEY.md §2.3: TP is unnecessary for these MLP-scale models (largest layer
is 1000 wide), but the layer library exposes it for API completeness and for
scaled-up variants. Column-parallel + row-parallel dense pair in the
Megatron layout:

    col: h = act(x @ W1[:, shard] + b1[shard])   (no comm; h feature-sharded)
    row: y = psum(h @ W2[shard, :], "model") + b2   (one allreduce per block)

Used under shard_map with weight shards stacked on a leading axis and
sharded over "model".
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def shard_dense_pair(w1, b1, w2, b2, n_shards):
    """Host-side Megatron split of a two-layer block: W1 column-sharded,
    W2 row-sharded, b2 replicated. Returns pytrees with a leading shard
    axis (for shard_map in_specs=P("model"))."""
    return {
        "w1": jnp.stack(jnp.split(jnp.asarray(w1), n_shards, axis=1)),
        "b1": jnp.stack(jnp.split(jnp.asarray(b1), n_shards, axis=0)),
        "w2": jnp.stack(jnp.split(jnp.asarray(w2), n_shards, axis=0)),
    }, jnp.asarray(b2)


def make_tp_mlp_block(mesh, axis="model", activation=jax.nn.relu):
    """Returns apply(shards, b2, x) = psum(act(x@W1s + b1s) @ W2s) + b2 —
    the Megatron two-dense block with one allreduce, over mesh axis
    ``axis``."""

    def local(shards, b2, x):
        # shard_map splits the leading stack axis: local leaves are (1, ...)
        w1, b1, w2 = shards["w1"][0], shards["b1"][0], shards["w2"][0]
        h = activation(jnp.dot(x, w1) + b1)
        y = jax.lax.psum(jnp.dot(h, w2), axis)
        return y + b2

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=P(),
        )
    )
