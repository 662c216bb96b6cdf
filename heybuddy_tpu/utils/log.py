"""
Logging for heybuddy-tpu.

Capability parity with the reference's ``util/log_util.py`` (global colored
logger, debug context), without the all-logger hijacking: we scope to our own
logger and offer a ``unified_logging`` context that temporarily quiets known
noisy third-party loggers instead of freezing the global handler set.
"""

from __future__ import annotations

import logging
import os
import sys
from contextlib import contextmanager
from typing import Iterator, Optional

__all__ = ["logger", "debug_logger", "unified_logging"]

_COLORS = {
    logging.DEBUG: "\033[36m",     # cyan
    logging.INFO: "\033[32m",      # green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
    logging.CRITICAL: "\033[35m",  # magenta
}
_RESET = "\033[0m"


class ColorFormatter(logging.Formatter):
    """Level-colored formatter when attached to a tty; plain otherwise."""

    def __init__(self, use_color: Optional[bool] = None) -> None:
        super().__init__(
            fmt="%(asctime)s [%(name)s] %(levelname)s %(message)s",
            datefmt="%H:%M:%S",
        )
        if use_color is None:
            use_color = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None
        self.use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        text = super().format(record)
        if self.use_color:
            color = _COLORS.get(record.levelno, "")
            if color:
                return f"{color}{text}{_RESET}"
        return text


def _build_logger() -> logging.Logger:
    log = logging.getLogger("heybuddy")
    if not log.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(ColorFormatter())
        log.addHandler(handler)
        log.propagate = False
    level = os.environ.get("HEYBUDDY_LOG_LEVEL", "INFO").upper()
    log.setLevel(getattr(logging, level, logging.INFO))
    return log


logger = _build_logger()

_NOISY_LOGGERS = ["jax", "datasets", "urllib3", "filelock", "fsspec", "matplotlib"]


@contextmanager
def unified_logging(level: int = logging.INFO) -> Iterator[None]:
    """Set our level and quiet known-noisy third-party loggers for the scope."""
    previous = logger.level
    noisy_previous = {}
    logger.setLevel(level)
    for name in _NOISY_LOGGERS:
        other = logging.getLogger(name)
        noisy_previous[name] = other.level
        other.setLevel(max(level, logging.WARNING))
    try:
        yield
    finally:
        logger.setLevel(previous)
        for name, lvl in noisy_previous.items():
            logging.getLogger(name).setLevel(lvl)


@contextmanager
def debug_logger() -> Iterator[None]:
    """Context manager enabling DEBUG-level logging (reference log_util.py:39-48)."""
    with unified_logging(logging.DEBUG):
        yield
