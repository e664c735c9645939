"""Sweep-cell checkpointing: preemption-safe table sweeps.

The reference discards every trained model and keeps results only on stdout —
a crash loses the whole multi-hour sweep (SURVEY.md §5, "Failure detection").
Here every completed sweep cell {table, modality, percent, ...} -> per-fold
errors is appended to a JSONL file as soon as it finishes; re-running the same
command skips completed cells, so table sweeps resume across preemptions.

JSONL (not a binary checkpoint) because the state is tiny, append-only writes
are atomic enough at this granularity, and the file doubles as the run's
result log. Model parameters are deliberately not persisted by default —
matching the reference's semantics where only the error statistic survives —
but train.gan.train_folds(with_params=True) exposes them for orbax users.
"""

import json
import os


class SweepCheckpoint:
    """Append-only {cell-key -> result} store backed by a JSONL file."""

    def __init__(self, path):
        self.path = path
        self._done = {}
        if path and os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    self._done[self._key(rec["cell"])] = rec["result"]

    @staticmethod
    def _key(cell):
        return json.dumps(cell, sort_keys=True)

    def get(self, **cell):
        return self._done.get(self._key(cell))

    def record(self, result, **cell):
        self._done[self._key(cell)] = result
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps({"cell": cell, "result": result}) + "\n")
                f.flush()
                os.fsync(f.fileno())
        return result
