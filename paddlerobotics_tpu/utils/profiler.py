"""Profiling + numeric-guard hooks, first-class (SURVEY §5).

The reference has only ad-hoc time.clock() deltas (train.py:192-200) and
a commented-out Paddle profiler (infer_v3.cpp:1689); its only numeric
guard is FLAGS_check_nan_inf on the Paddle trainer (attn_model.sh:23).
Here:
- `trace(logdir)`: jax.profiler context for TensorBoard-viewable TPU
  traces;
- `StepTimer`: steps/sec + env-steps/sec counters with EMA;
- `enable_nan_checks()`: jax debug_nans (the FLAGS_check_nan_inf
  equivalent — fails fast on the first NaN-producing op);
- `annotate`: TraceAnnotation for named regions in profiles.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TPU trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    """FLAGS_check_nan_inf equivalent: error on first NaN."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Throughput counter with exponential moving average."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._t = None
        self.steps_per_sec = 0.0

    def tick(self, n_steps: int = 1) -> float:
        now = time.perf_counter()
        if self._t is not None:
            inst = n_steps / max(now - self._t, 1e-9)
            self.steps_per_sec = (self.ema * self.steps_per_sec +
                                  (1 - self.ema) * inst
                                  if self.steps_per_sec else inst)
        self._t = now
        return self.steps_per_sec
