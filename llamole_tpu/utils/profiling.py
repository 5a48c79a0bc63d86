"""Profiling hooks: jax.profiler traces + phase timers.

The reference has no profiler (SURVEY §5 tracing: none); this is the
cheap superset — wrap any phase in ``trace(...)`` to capture a
TensorBoard-compatible device trace, or use PhaseTimer for wall-clock
accounting of host/device phases.
"""

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

from .logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace when log_dir (or LLAMOLE_TRACE_DIR)
    is set; no-op otherwise."""
    log_dir = log_dir or os.environ.get("LLAMOLE_TRACE_DIR")
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
    logger.info("profiler trace written to %s", log_dir)


class PhaseTimer:
    """Accumulating per-phase wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }
