"""Tracing & per-step timing — first-class observability.

The reference has none (SURVEY.md §5.1: logging + tqdm + a stdout regex).
Here: jax.profiler device traces on demand and a StepTimer that records
wall-per-denoise-step, exportable as JSON for the serving /metrics surface.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(out_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Track per-step latency; hand `timer.tick` to pipeline(progress=...)."""

    steps_ms: List[float] = field(default_factory=list)
    _last: Optional[float] = None

    def tick(self, i: int, n: int) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.steps_ms.append((now - self._last) * 1e3)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self.steps_ms:
            return {"steps": 0}
        xs = sorted(self.steps_ms)
        return {
            "steps": len(xs),
            "mean_ms": sum(xs) / len(xs),
            "p50_ms": xs[len(xs) // 2],
            "p90_ms": xs[int(len(xs) * 0.9)],
            "min_ms": xs[0],
            "max_ms": xs[-1],
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"steps_ms": self.steps_ms, **self.summary()}, f)
