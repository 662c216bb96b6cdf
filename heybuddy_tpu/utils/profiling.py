"""
Tracing and timing utilities.

The reference has only ad-hoc ``perf_counter`` spans (SURVEY.md §5). Here the
equivalents are first-class: ``stage_timer`` wraps any pipeline stage with an
EMA-tracked wall-clock span, and ``trace`` bridges to ``jax.profiler`` so
device timelines (XProf) capture the same stage names when profiling is on.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax

from heybuddy_tpu.utils.log import logger
from heybuddy_tpu.utils.strings import human_duration

__all__ = ["StageTimes", "stage_timer", "trace", "start_profiler", "stop_profiler"]


class StageTimes:
    """EMA + total wall-clock per named stage."""

    def __init__(self, ema_weight: float = 0.1) -> None:
        self.ema_weight = ema_weight
        self.ema: Dict[str, float] = {}
        self.total: Dict[str, float] = {}
        self.count: Dict[str, int] = {}

    def record(self, name: str, seconds: float) -> None:
        self.total[name] = self.total.get(name, 0.0) + seconds
        self.count[name] = self.count.get(name, 0) + 1
        if name in self.ema:
            self.ema[name] = self.ema_weight * seconds + (1 - self.ema_weight) * self.ema[name]
        else:
            self.ema[name] = seconds

    def summary(self) -> str:
        lines = []
        for name in sorted(self.total, key=self.total.get, reverse=True):
            lines.append(
                f"{name}: total {human_duration(self.total[name])} "
                f"({self.count[name]}x, ema {self.ema[name] * 1000:.1f}ms)"
            )
        return "\n".join(lines)


GLOBAL_STAGE_TIMES = StageTimes()


@contextlib.contextmanager
def stage_timer(name: str, times: Optional[StageTimes] = None) -> Iterator[None]:
    """Time a stage and annotate the device trace with the same name."""
    times = times or GLOBAL_STAGE_TIMES
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    times.record(name, time.perf_counter() - start)


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """Pure device-trace annotation (no host timing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


_PROFILER_ACTIVE = False


def start_profiler(log_dir: Optional[str] = None) -> Optional[str]:
    """Start a jax.profiler trace; returns the log dir (None on failure)."""
    global _PROFILER_ACTIVE
    log_dir = log_dir or os.environ.get("HEYBUDDY_PROFILE_DIR", "/tmp/heybuddy-profile")
    try:
        jax.profiler.start_trace(log_dir)
        _PROFILER_ACTIVE = True
        logger.info(f"Profiler trace started -> {log_dir}")
        return log_dir
    except Exception as ex:
        logger.warning(f"Could not start profiler: {ex}")
        return None


def stop_profiler() -> None:
    global _PROFILER_ACTIVE
    if _PROFILER_ACTIVE:
        jax.profiler.stop_trace()
        _PROFILER_ACTIVE = False
        logger.info("Profiler trace stopped")
