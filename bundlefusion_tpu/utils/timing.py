"""Per-stage timing accumulators — the rebuild of ``TimingLog.h/.cpp`` and
``SiftGPU/CUDATimer.h`` (SURVEY.md §5 "Tracing / profiling").

Device work is async under JAX; stage timers bracket with
``jax.block_until_ready`` so the number measures the stage, not dispatch.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class TimingLog:
    """Accumulates wall-clock per named stage: count, total, min/max."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.maxes: dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None, block=None):
        """block_on: pytree to wait for; block: thunk evaluated at stage end
        returning the pytree to wait for (for values produced in the stage)."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block())
            elif block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.maxes[name] = max(self.maxes[name], dt)

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1
        self.maxes[name] = max(self.maxes[name], seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
                "max_ms": 1e3 * self.maxes[k],
            }
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>7}{'mean ms':>10}{'max ms':>10}{'total s':>10}"]
        for k, v in self.summary().items():
            lines.append(
                f"{k:<24}{v['count']:>7}{v['mean_ms']:>10.2f}{v['max_ms']:>10.2f}{v['total_s']:>10.2f}"
            )
        return "\n".join(lines)
