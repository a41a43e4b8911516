"""Metrics / diagnostics logging.

Replaces the reference's scattered observability (per-iteration
compute_prob_train/valid logs, `accuracy.report`, the `log_alpha` stdout
print each update — SURVEY.md §5.1/§5.5) with a structured in-process
recorder: scalar series keyed by name, JSONL persistence, and a progress
report generator.  Hooks for the JAX profiler cover tracing.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_path: Optional[str] = None, print_every: int = 0):
        self.series = defaultdict(list)
        self.log_path = log_path
        self.print_every = print_every
        self._fh = None
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            self._fh = open(log_path, "a")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            v = float(np.asarray(v))
            rec[k] = v
            self.series[k].append((step, v))
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.print_every and step % self.print_every == 0:
            msg = " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                           if k not in ("time",))
            print(f"[metrics] {msg}", flush=True)

    def last(self, name: str) -> Optional[float]:
        s = self.series.get(name)
        return s[-1][1] if s else None

    def report(self) -> str:
        """accuracy.report-style summary (`train.py:617-624`)."""
        lines = []
        for name, s in sorted(self.series.items()):
            vals = [v for _, v in s]
            lines.append(
                f"{name}: first={vals[0]:.4f} last={vals[-1]:.4f} "
                f"best={max(vals):.4f} n={len(vals)}"
            )
        return "\n".join(lines)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
