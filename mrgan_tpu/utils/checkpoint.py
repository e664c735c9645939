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
    """Append-only {cell-key -> result} store backed by a JSONL file.

    Records optionally carry a provenance ``stamp`` (utils/stamp.py): the
    generator calibration version + git sha the cell was produced under, so
    downstream comparisons can refuse mixed-generation artifact sets
    (VERDICT r4 weak #4).
    """

    def __init__(self, path):
        self.path = path
        self._done = {}
        self.generators = set()  # generator versions seen in the file
        if path and os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    self._done[self._key(rec["cell"])] = rec["result"]
                    self.generators.add(
                        (rec.get("stamp") or {}).get("generator",
                                                     "unstamped"))

    @staticmethod
    def _key(cell):
        return json.dumps(cell, sort_keys=True)

    def get(self, **cell):
        return self._done.get(self._key(cell))

    def record(self, result, stamp=None, **cell):
        self._done[self._key(cell)] = result
        if self.path:
            rec = {"cell": cell, "result": result}
            if stamp:
                rec["stamp"] = stamp
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
                f.flush()
                os.fsync(f.fileno())
        return result


def file_generators(path):
    """Set of generator versions stamped in a checkpoint JSONL file
    (empty if the file is absent; "unstamped" counts rows without one)."""
    gens = set()
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    gens.add((rec.get("stamp") or {}).get("generator",
                                                          "unstamped"))
    return gens
