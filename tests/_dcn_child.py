"""Child process for the two-process DCN smoke test (tests/test_multihost.py).

Each of 2 processes owns 4 virtual CPU devices; jax.distributed.initialize
forms the 8-device global view, multihost.global_mesh spans both processes on
the cell axis, and a stacked 8-cell GAN workload trains sharded across DCN.
Each process independently recomputes its local work items single-process and
asserts the sharded results match — the actual initialize + cross-process
cell-mesh path, end to end.

Usage: python tests/_dcn_child.py <coordinator_addr> <process_id>
(XLA_FLAGS must force 4 host devices; set by the parent test.)
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

addr, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, ".")
from mrgan_tpu.parallel import multihost  # noqa: E402
from mrgan_tpu.train import gan  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()

mesh = multihost.global_mesh(n_data=1)
assert mesh.shape == {"cell": 8, "data": 1}, mesh.shape
assert mesh.devices.size == 8

# deterministic 8-cell workload, identical in both processes
W, n_lab, n_pool, n_test, d, n_train = 8, 30, 60, 20, 32, 60
rng = np.random.RandomState(0)
keys = jax.random.split(jax.random.PRNGKey(7), W)
xl = rng.randn(W, n_lab, d).astype(np.float32)
yl = rng.randint(0, 6, (W, n_lab)).astype(np.int32)
pool = rng.randn(W, n_pool, d).astype(np.float32)
xt = rng.randn(W, n_test, d).astype(np.float32)
yt = rng.randint(0, 6, (W, n_test)).astype(np.int32)
cfg = gan.GanConfig(noise_size=8, batch_size=10, epochs=2, pad_multiple=1)

sh = NamedSharding(mesh, P("cell"))
start, stop = multihost.shard_work_across_processes(W)
assert (stop - start) == 4  # 8 work items over 2 processes


def to_global(a):
    # each process feeds only ITS shard of the work axis (the multi-host
    # ingestion path the module docstring promises)
    local = np.asarray(a[start:stop])
    return jax.make_array_from_process_local_data(sh, local)


def one(key, xl, yl, pool, xt, yt):
    err, _ = gan._train_one(key, xl, yl, pool, xt, yt, n_train=n_train,
                            valid_dim=d, cfg=cfg)
    return err


fn = jax.jit(jax.vmap(one), in_shardings=(sh,) * 6, out_shardings=sh)
errs = fn(to_global(np.asarray(keys)), to_global(xl), to_global(yl),
          to_global(pool), to_global(xt), to_global(yt))

# local single-process recomputation of this process's own work items
local_fn = jax.jit(jax.vmap(one))
want = local_fn(keys[start:stop], xl[start:stop], yl[start:stop],
                pool[start:stop], xt[start:stop], yt[start:stop])
got = np.concatenate([np.asarray(s.data).ravel()
                      for s in sorted(errs.addressable_shards,
                                      key=lambda s: s.index[0].start or 0)])
np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)
assert np.all((got >= 0) & (got <= 1))
print(f"DCN_SMOKE_OK process={pid} errs={got.tolist()}")
