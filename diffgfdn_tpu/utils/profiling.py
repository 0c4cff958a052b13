"""Profiling / observability helpers (SURVEY.md §5.1 rebuild).

The reference only prints wall-clock epoch times (trainer.py:352,413). Here
we add first-class counters: steps/sec, RIR-synthesis x-realtime, and a
``jax.profiler`` trace context for TPU timeline capture.
"""

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

logger = logging.getLogger("diffgfdn_tpu")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Steps/sec counter with warmup discard."""

    warmup: int = 1
    _times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    @property
    def steps_per_sec(self) -> float:
        steady = self._times[self.warmup :] or self._times
        return len(steady) / sum(steady) if steady else 0.0

    @property
    def mean_step_ms(self) -> float:
        steady = self._times[self.warmup :] or self._times
        return 1e3 * sum(steady) / len(steady) if steady else 0.0


def x_realtime(audio_seconds: float, wall_seconds: float) -> float:
    """Synthesis speed as a multiple of real time."""
    return audio_seconds / max(wall_seconds, 1e-12)


def get_str_results(
    epoch: Optional[int] = None,
    train_loss: Optional[List[float]] = None,
    time_s: Optional[float] = None,
    individual_losses: Optional[List[Dict]] = None,
) -> str:
    """Epoch summary string (reference: utils.py:182-203)."""
    parts = []
    if epoch is not None:
        parts.append(f"epoch: {epoch:3d}")
    if train_loss:
        parts.append(f"train_loss: {train_loss[-1]:6.4f}")
    if time_s is not None:
        parts.append(f"time: {time_s:6.4f}s")
    if individual_losses:
        for key, value in individual_losses[-1].items():
            parts.append(f"{key}: {value: .3f}")
    return ", ".join(parts)


def emit_metric(metric: str, value: float, unit: str,
                vs_baseline: Optional[float] = None) -> str:
    """One-line JSON metric record (the bench contract format)."""
    line = json.dumps(
        {"metric": metric, "value": value, "unit": unit,
         "vs_baseline": vs_baseline}
    )
    logger.info(line)
    return line
