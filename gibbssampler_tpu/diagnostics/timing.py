"""Per-phase timing and profiling helpers.

The reference wraps every Gibbs sub-step in wall/CPU timers and stores the
histories with the chain (GibbsSampler.py:101-113,151-168, ASIS.py:92-123).
On an accelerator the analogue is fenced timing around compiled calls plus
optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

__all__ = ["PhaseTimer", "profile_trace"]


@dataclass
class PhaseTimer:
    """Accumulates fenced wall-clock per named phase.

    with timer("cr_step"):
        out = step(...)          # blocks on exit => honest device time
    """

    totals: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)
    history: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        self.history.setdefault(name, []).append(dt)

    def summary(self) -> dict:
        return {
            name: {"total_s": tot, "count": self.counts[name],
                   "mean_ms": 1e3 * tot / self.counts[name]}
            for name, tot in self.totals.items()
        }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof); no-op on
    backends without profiling support."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
