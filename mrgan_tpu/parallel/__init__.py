"""Parallelism over ``jax.sharding.Mesh``.

The reference is entirely single-process, single-device (SURVEY.md §2.3): its
dominant cost is the *sweep* — e.g. Table 1 is 7 modalities x 7 percents x
6 folds = 294 independent GAN trainings run serially (mr_gan.py:248-261,
"several hours with a GPU", README.md:15). The TPU-native design makes that
sweep the unit of parallelism:

- ``mesh``   mesh construction helpers ("cell" x "data" axes).
- ``sweep``  embarrassingly-parallel sharding of stacked same-shape trainings
             across the "cell" axis (vmap + leading-axis NamedSharding: XLA
             partitions with zero collectives).
- ``spmd``   shard_map'd fused GAN train step with real DP: batch axis sharded
             over "data", gradients pmean'd over ICI — the full multi-chip
             training step that __graft_entry__.dryrun_multichip compiles.
"""

from . import mesh, spmd, sweep  # noqa: F401
