"""Cross-cutting utilities: sweep checkpointing, metric streams, profiling.

The reference has none of these (SURVEY.md §5): a crash loses the whole
multi-hour sweep, metrics are prints, and profiling is time.time() deltas.
"""

from . import checkpoint, metrics  # noqa: F401
