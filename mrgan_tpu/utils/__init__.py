"""Cross-cutting utilities (SURVEY.md §5 — the reference has none of these):

- ``checkpoint``     preemption-safe sweep-cell store (JSONL, resume skips)
- ``metrics``        structured metric stream + reference-format stdout
- ``profiling``      jax.profiler trace/annotation helpers, steps/sec meter
- ``params_io``      orbax parameter snapshots (pickle fallback)
- ``rng``            PRNG key construction (rbg default — 2x faster draws)
- ``compile_cache``  persistent XLA compilation cache across processes
"""

from . import checkpoint, compile_cache, metrics, params_io, profiling, rng  # noqa: F401
