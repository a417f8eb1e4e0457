"""Tracing / profiling / throughput instrumentation.

The reference has no profiling hooks at all (SURVEY.md section 5: "none; the
only progress indicator is an optional tqdm bar").  This module provides the
observability layer the north-star metric needs:

* :class:`Throughput` -- steps/sec counters with compile-time exclusion,
* :func:`trace` -- a context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace,
* :func:`timed` -- lightweight wall-clock section timer with
  ``block_until_ready`` semantics so device work is actually measured.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

log = logging.getLogger("chiron_tpu")


@dataclass
class Throughput:
    """Steps/sec accounting that separates compile from steady state.

    Example
    -------
    >>> tp = Throughput()
    >>> with tp.measure(n_steps=1000):
    ...     state = runner.run(state, 1000)
    >>> tp.steps_per_second
    """

    total_steps: int = 0
    total_seconds: float = 0.0
    sections: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, n_steps: int, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.total_steps += n_steps
        self.total_seconds += dt
        self.sections.append(dt)

    @property
    def steps_per_second(self) -> float:
        if self.total_seconds == 0:
            return 0.0
        return self.total_steps / self.total_seconds

    @property
    def steps_per_minute(self) -> float:
        return self.steps_per_second * 60.0

    def report(self) -> Dict[str, float]:
        return {
            "total_steps": self.total_steps,
            "total_seconds": round(self.total_seconds, 4),
            "steps_per_second": round(self.steps_per_second, 2),
            "steps_per_minute": round(self.steps_per_minute, 1),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/chiron_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    >>> with trace("/tmp/tr"):
    ...     state = runner.run(state, 1000)
    ...     jax.block_until_ready(state.x)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def timed(name: str, sync=None):
    """Wall-clock a section, blocking on ``sync`` so device work is counted."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    log.info("[timed] %s: %.4fs", name, dt)


def enable_nan_debugging(enable: bool = True) -> None:
    """Global NaN tripwire (SURVEY.md section 5 race-detection analogue).

    Turns on ``jax.debug_nans`` so the first NaN-producing primitive raises
    with a traceback instead of silently propagating.  Expensive; use for
    debugging only -- the MC NaN-guard (mcmc.py) is the production mechanism.
    """
    jax.config.update("jax_debug_nans", enable)
