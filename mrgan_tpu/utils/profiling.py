"""Profiling hooks (SURVEY.md §5: the reference has only time.time() prints).

- ``trace(logdir)``: context manager around ``jax.profiler`` so any sweep can
  be captured for TensorBoard/XProf;
- ``annotate(name)``: TraceAnnotation for labeling sweep cells in a capture;
- ``Throughput``: steps/sec/chip meter feeding the metric stream — the
  BASELINE.json north-star counter.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Steps/sec(/chip) meter. mark(steps) after each synced chunk of work."""

    def __init__(self, n_chips=None, stream=None, metric="train_steps"):
        self.n_chips = n_chips or jax.device_count()
        self.stream = stream
        self.metric = metric
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def mark(self, steps):
        self.steps += steps

    def per_sec_per_chip(self):
        dt = time.perf_counter() - self.t0
        return self.steps / dt / self.n_chips if dt > 0 else 0.0

    def emit(self, **fields):
        value = self.per_sec_per_chip()
        if self.stream is not None:
            self.stream.emit(self.metric, steps_per_sec_per_chip=value,
                             **fields)
        return value
