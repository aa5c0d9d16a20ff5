"""Structured metrics and phase timing.

Replaces the reference's printf observability (scanline progress at
camera.rs:221, discovery summaries at orchestrator_server.rs:214-220) with
per-phase timers, rays/s counters, and optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


@dataclass
class RenderMetrics:
    rays_traced: int = 0
    samples_done: int = 0
    phase_seconds: Dict[str, float] = field(default_factory=dict)
    _start: Optional[float] = None

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phase_seconds[name] = self.phase_seconds.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def add_rays(self, n: int) -> None:
        self.rays_traced += n

    @property
    def rays_per_sec(self) -> float:
        total = sum(self.phase_seconds.values())
        return self.rays_traced / total if total > 0 else 0.0

    def report(self, stream=None) -> None:
        # resolve at call time: a default-arg sys.stderr binds whatever
        # stream was installed at import (e.g. pytest's capture) forever
        stream = stream if stream is not None else sys.stderr
        print(
            json.dumps(
                {
                    "rays_traced": self.rays_traced,
                    "samples_done": self.samples_done,
                    "rays_per_sec": round(self.rays_per_sec, 1),
                    "phases": {k: round(v, 3) for k, v in self.phase_seconds.items()},
                }
            ),
            file=stream,
            flush=True,
        )


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace around a block (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_best(fn, *args, iters=3, reps=1, block_until_ready=None):
    """Mean of `iters` dispatches, best of `reps` such means, after a
    warmup call: per-dispatch tunnel overhead amortizes over iters, and
    the best-of guards against a remote-compile-service hiccup landing
    inside one rep (measured 47 vs 40 ms run-to-run on an identical cached
    program).  Shared by bench.py and scripts/vpu_roofline.py."""
    import time as _time

    import jax as _jax

    block = block_until_ready or _jax.block_until_ready
    out = fn(*args)
    block(out)  # compile + warmup
    best = float("inf")
    for _ in range(max(1, reps)):
        t0 = _time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        block(out)
        best = min(best, (_time.perf_counter() - t0) / iters)
    return best
