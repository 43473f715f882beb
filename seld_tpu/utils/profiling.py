"""Tracing / profiling subsystem.

The reference has no profiling beyond per-batch wall-clock running averages
(SURVEY.md §5: tracing is greenfield). Here:

- :class:`StepTimer` — per-step wall-clock statistics with warmup skipping
  (compile steps excluded from averages).
- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory for TPU timeline analysis.
- :class:`MetricsLogger` — append-only JSONL metrics log (offline-friendly
  stand-in for the reference's commented-out wandb integration,
  reference train.py:470-478,623-656).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


class StepTimer:
    """Wall-clock step timing with warmup exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup_steps:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.times else 0.0

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        return {
            "steps": len(ts),
            "mean_s": self.mean,
            "p50_s": ts[len(ts) // 2],
            "max_s": ts[-1],
            "steps_per_sec": self.steps_per_sec,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Crash-safe JSONL metrics log (one flat dict per line)."""

    def __init__(self, path: str):
        self.path = path
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self) -> List[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
