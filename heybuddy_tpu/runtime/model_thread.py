"""
Threaded asynchronous inference.

Capability parity with reference ``util/model_util.py`` (WakeWordModelThread):
input/output queues around a wake-word model loaded from any checkpoint
format, with per-prediction wall-time measurement. Used by ``heybuddy listen``
to run several models concurrently against the same audio stream.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Optional, Tuple

import numpy as np

from heybuddy_tpu.utils.log import logger

__all__ = ["WakeWordModelThread"]


class WakeWordModelThread:
    """Runs one wake-word model on its own thread, fed through queues."""

    def __init__(self, checkpoint_path: str, threshold: float = 0.5) -> None:
        self.checkpoint_path = checkpoint_path
        self.threshold = threshold
        self.input_queue: "queue.Queue[Optional[Tuple[int, np.ndarray]]]" = queue.Queue()
        self.output_queue: "queue.Queue[Tuple[int, float, float]]" = queue.Queue()
        self.last_duration = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._model: Any = None
        self._load_error: Optional[Exception] = None
        self._seq = 0
        self._thread.start()

    def _load(self) -> Any:
        from heybuddy_tpu.cli import _load_any_model

        return _load_any_model(self.checkpoint_path)

    def run(self) -> None:
        try:
            self._model = self._load()
        except Exception as ex:
            # Remember the failure so get() can surface it instead of the
            # caller blocking its full timeout on every put/get cycle.
            self._load_error = ex
            logger.error(f"Failed to load {self.checkpoint_path}: {ex}")
            return
        while not self._stop.is_set():
            try:
                item = self.input_queue.get(timeout=0.5)
            except queue.Empty:
                continue
            if item is None:
                break
            seq, audio = item
            start = time.perf_counter()
            try:
                scores = self._model.predict(audio, return_scores=True)
                score = float(scores[0]) if scores else 0.0
            except Exception as ex:
                logger.error(f"Prediction failed for {self.checkpoint_path}: {ex}")
                score = 0.0
            self.last_duration = time.perf_counter() - start
            self.output_queue.put((seq, score, self.last_duration))

    def put(self, audio: np.ndarray) -> None:
        self._seq += 1
        self.input_queue.put((self._seq, audio))

    def get(self, timeout: Optional[float] = None) -> Tuple[float, float]:
        """Returns (score, seconds_taken) for the LATEST put().

        Results are sequence-tagged: if an earlier get() timed out (e.g.
        first-prediction jit compile) the late result is discarded here
        rather than desynchronizing every later score from its audio chunk.
        """
        if self._load_error is not None:
            raise RuntimeError(
                f"model failed to load from {self.checkpoint_path}: {self._load_error}"
            )
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            remaining = (
                None if deadline is None else max(0.0, deadline - time.monotonic())
            )
            seq, score, duration = self.output_queue.get(timeout=remaining)
            if seq == self._seq:
                return score, duration

    def stop(self) -> None:
        self._stop.set()
        self.input_queue.put(None)
        self._thread.join(timeout=5)
