"""PRNG key construction.

Profiled on v5e: the default threefry generator costs ~0.24 ms per fused
train step for the GaussianNoise draws — half the step. XLA's RngBitGenerator
('rbg') halves that at identical noise statistics, so the protocol layer
builds rbg keys by default. All trainers take keys as arguments and are
impl-agnostic (jax.random.split/fold_in/normal work with any typed key).
"""

import jax

DEFAULT_IMPL = "rbg"


def make_key(seed, impl=None):
    return jax.random.key(seed, impl=impl or DEFAULT_IMPL)


def make_keys(seed, n, impl=None):
    return jax.random.split(make_key(seed, impl), n)
