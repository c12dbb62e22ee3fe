"""Tracing/profiling hooks.

The reference has no first-party observability beyond PETSc's snes_monitor
and hand-rolled prints of inner-Newton statistics (SURVEY.md section 5).
Here: a trace context manager around ``jax.profiler`` plus a tiny
wall-clock/step-stats recorder used by the demos and bench.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax

__all__ = ["trace", "StepStats"]


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) when
    ``logdir`` is given; no-op otherwise."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class StepStats:
    """Per-load-step statistics: wall time, Newton/CG iterations, inner
    return-map telemetry (iters histogram, max |f|, max ||r||)."""

    def __init__(self):
        self.steps = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, **fields):
        wall = None if self._t0 is None else time.perf_counter() - self._t0
        rec = {"wall_s": wall, **fields}
        self.steps.append(rec)
        self._t0 = None
        return rec

    def summary(self):
        if not self.steps:
            return {}
        walls = [s["wall_s"] for s in self.steps if s.get("wall_s") is not None]
        out = {"n_steps": len(self.steps)}
        if walls:
            out.update(total_wall_s=sum(walls), mean_wall_s=sum(walls) / len(walls),
                       max_wall_s=max(walls))
        for key in ("newton_its", "cg_its"):
            vals = [s[key] for s in self.steps if key in s]
            if vals:
                out[f"total_{key}"] = int(sum(vals))
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump({"steps": self.steps, "summary": self.summary()}, f, indent=1)
