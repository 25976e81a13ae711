"""Tracing and phase timing.

The reference has no profiling beyond coarse ``time.process_time`` deltas
(SURVEY.md §5).  Here: named phase timers with a global registry (wall time,
call counts) and a thin wrapper over ``jax.profiler`` for XLA-level traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_PHASES: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str, sync=None):
    """Time a named phase.  Pass ``sync=some_array`` (or pytree) to block on
    device completion before stopping the clock."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        _PHASES[name].append(time.perf_counter() - t0)


def report() -> dict[str, dict[str, float]]:
    """Aggregate phase timings: {name: {count, total_s, mean_s}}."""
    out = {}
    for name, times in _PHASES.items():
        out[name] = {"count": len(times), "total_s": sum(times),
                     "mean_s": sum(times) / len(times)}
    return out


def reset() -> None:
    _PHASES.clear()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace (open with TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
