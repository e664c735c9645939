#!/usr/bin/env python3
"""Hardware exactness check for the bf16 shadow-weight mechanism.

The +12.5% shadow-weight optimization rests on one hardware invariant: on the
TPU MXU, a DEFAULT-precision f32 dot truncates its operands to bf16 per pass,
so feeding a pre-truncated bf16 W (optim.mm_shadow) is BITWISE identical to
the f32 dot. CPU CI cannot check this (XLA computes f32 dots exactly there,
so shadow != master off-TPU); this tool runs wherever a TPU is attached and
asserts bitwise equality across representative trainer shapes — run it as
part of any hardware verification pass (tests/test_optim.py carries a
TPU-gated pytest twin for environments that run pytest on the chip).

Exit 0 + "SHADOW_EXACTNESS_PASS" on success; nonzero with a diff report on
regression.
"""

import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mrgan_tpu  # noqa: F401,E402  (honors MRGAN_PLATFORM backend pinning)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def check(m, k, n, seed):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32) * 3)
    w = rng.randn(k, n).astype(np.float32)
    b = rng.randn(n).astype(np.float32)

    from mrgan_tpu.models import nets
    from mrgan_tpu.train import optim

    p32 = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    psh = optim.mm_shadow(p32)
    assert psh["w"].dtype == jnp.bfloat16

    f32 = jax.jit(lambda p, x: nets.dense(p, x))(p32, x)
    sh = jax.jit(lambda p, x: nets.dense(p, x))(psh, x)
    a, c = np.asarray(f32), np.asarray(sh)
    bits_equal = np.array_equal(a.view(np.uint32), c.view(np.uint32))
    return bits_equal, float(np.abs(a - c).max())


def main():
    # Backend-init watchdog (same shape as bench.py): when the remote TPU
    # pool is unreachable the first device touch blocks forever inside the
    # PJRT client constructor, in C, where no Python signal can unwind it —
    # fail loudly instead of wedging whatever harness invoked the check.
    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(300):
            print("check_shadow_exactness: backend init timed out "
                  "(TPU pool unreachable?)", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    backend = jax.default_backend()
    init_done.set()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, not a TPU — the invariant is "
              "hardware-specific (CPU computes f32 dots exactly).")
        return 0
    # the trainer's big matrices: disc d0 (D x 1000), gen out (500 x D),
    # plus odd/narrow shapes
    shapes = [(150, 3712, 1000), (50, 500, 3712), (20, 1280, 1000),
              (50, 100, 500), (7, 250, 6)]
    ok = True
    for i, (m, k, n) in enumerate(shapes):
        bits_equal, maxdiff = check(m, k, n, seed=i)
        status = "OK " if bits_equal else "FAIL"
        print(f"[{status}] dense {m}x{k}@{k}x{n}: max|f32 - shadow| = "
              f"{maxdiff:.3g}")
        ok &= bits_equal
    if ok:
        print("SHADOW_EXACTNESS_PASS")
        return 0
    print("SHADOW_EXACTNESS_FAIL: the MXU DEFAULT-precision truncation "
          "invariant does not hold — set matmul_weight_dtype='float32' "
          "until diagnosed.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
