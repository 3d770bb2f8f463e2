"""Scalar metrics logging to JSONL (tensorboard-free observability).

Reference counterpart (SURVEY.md §5 "Metrics / logging"): the reference
logs scalars only into the text logfile; this adds a machine-readable
stream per run (one JSON object per line: step, wall time, metrics).
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def write(self, step: int, **metrics):
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
