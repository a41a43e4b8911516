"""Metrics / diagnostics logging.

Replaces the reference's scattered observability (per-iteration
compute_prob_train/valid logs, `accuracy.report`, the `log_alpha` stdout
print each update — SURVEY.md §5.1/§5.5) with a structured in-process
recorder: scalar series keyed by name, JSONL persistence, and a progress
report generator.  Hooks for the JAX profiler cover tracing.

`log()` is DEFERRED: metric values may be live jax arrays and are not
converted until `flush()` (every ``flush_every`` records, or on
`last()`/`report()`/`close()`).  Converting per step would block the host
on every device round trip — through a remote-device tunnel that single
sync was measured to dominate the whole train loop (seconds per step vs a
~10 ms device step).  At flush, each series is stacked ON DEVICE into one
array so a flush costs O(#metric-names) fetches, not O(#steps).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np


def _materialize(vals):
    """Fetch a list of scalars (possibly live jax arrays) as one np array
    with a single device round trip per series."""
    first = vals[0]
    if type(first).__module__.startswith("jax") or hasattr(first, "addressable_data"):
        import jax
        import jax.numpy as jnp

        stacked = jnp.stack([jnp.reshape(v, ()) for v in vals])
        return np.asarray(jax.device_get(stacked), np.float64)
    return np.asarray([float(v) for v in vals], np.float64)


class MetricsLogger:
    def __init__(self, log_path: Optional[str] = None, print_every: int = 0,
                 flush_every: int = 256):
        self._series = defaultdict(list)
        self.log_path = log_path
        self.print_every = print_every
        self.flush_every = flush_every
        self._pending: List[Tuple[int, float, Dict[str, object]]] = []
        self._fh = None
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            self._fh = open(log_path, "a")

    @property
    def series(self):
        """Flushes pending records so direct readers see everything."""
        self.flush()
        return self._series

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        """Record a step's metrics WITHOUT synchronizing the device."""
        self._pending.append((int(step), time.time(), dict(metrics)))
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        pend, self._pending = self._pending, []
        if not pend:
            return
        cols: Dict[str, List] = defaultdict(list)
        idx: Dict[str, List[int]] = defaultdict(list)
        for j, (_, _, m) in enumerate(pend):
            for k, v in m.items():
                cols[k].append(v)
                idx[k].append(j)
        vals = {k: _materialize(v) for k, v in cols.items()}
        recs = [{"step": s, "time": t} for s, t, _ in pend]
        for k, js in idx.items():
            for pos, j in enumerate(js):
                v = float(vals[k][pos])
                recs[j][k] = v
                self._series[k].append((pend[j][0], v))
        for rec in recs:
            if self._fh:
                self._fh.write(json.dumps(rec) + "\n")
            if self.print_every and rec["step"] % self.print_every == 0:
                msg = " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                               if k not in ("time",))
                print(f"[metrics] {msg}", flush=True)
        if self._fh:
            self._fh.flush()

    def last(self, name: str) -> Optional[float]:
        self.flush()
        s = self._series.get(name)
        return s[-1][1] if s else None

    def report(self) -> str:
        """accuracy.report-style summary (`train.py:617-624`)."""
        self.flush()
        lines = []
        for name, s in sorted(self._series.items()):
            vals = [v for _, v in s]
            lines.append(
                f"{name}: first={vals[0]:.4f} last={vals[-1]:.4f} "
                f"best={max(vals):.4f} n={len(vals)}"
            )
        return "\n".join(lines)

    def close(self):
        self.flush()
        if self._fh:
            self._fh.close()
            self._fh = None
