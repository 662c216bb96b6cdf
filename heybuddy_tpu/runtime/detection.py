"""
Detection gating for streaming wake-word scores.

The deployed runtimes score a sliding window every ~0.12 s (browser
`hey-buddy.js`, `runtime/listen.py`, reference hey-buddy.ts:382). A true
utterance keeps the phrase fully inside the 1.44 s window for several
consecutive strides, so its score stays high for >= 2-4 windows, while most
streaming false positives are single-window spikes (measured in
scripts/quality_eval.py: requiring 2 consecutive windows removes the
majority of stream FPs at zero recall cost). ``ConsecutiveGate`` packages
that logic so the CLI listener, the offline harness, and tests share one
implementation; the browser runtime mirrors the threshold/run semantics
(`consecutiveFrames` option in browser/src/hey-buddy.js — inclusive
threshold, run resets after firing) but keeps the reference's WALL-CLOCK
debounce (`debounceSeconds`, reference hey-buddy.ts:317-333) instead of
this gate's window-count cooldown.

The reference fires on a single window with a wall-clock debounce
(reference hey-buddy.ts:317-333); ``consecutive=1`` reproduces that
behavior exactly, and is the default everywhere.
"""

from __future__ import annotations


class ConsecutiveGate:
    """Fire when ``consecutive`` successive scores reach ``threshold``.

    After a detection, a refractory period of ``debounce_windows`` window
    strides suppresses re-triggering (the runtimes' ~1.92 s debounce at the
    0.12 s stride is 16 windows).
    """

    def __init__(
        self,
        threshold: float = 0.5,
        consecutive: int = 1,
        debounce_windows: int = 16,
    ) -> None:
        if consecutive < 1:
            raise ValueError(f"consecutive must be >= 1, got {consecutive}")
        self.threshold = float(threshold)
        self.consecutive = int(consecutive)
        self.debounce_windows = int(debounce_windows)
        self.reset()

    def reset(self) -> None:
        self._run = 0
        self._cooldown = 0

    def update(self, score: float) -> bool:
        """Feed one window score; returns True when a detection fires."""
        if self._cooldown > 0:
            self._cooldown -= 1
            return False
        if score >= self.threshold:
            self._run += 1
            if self._run >= self.consecutive:
                self._run = 0
                self._cooldown = self.debounce_windows
                return True
        else:
            self._run = 0
        return False


def count_detections(
    scores: "np.ndarray",
    threshold: float,
    consecutive: int = 1,
    debounce_windows: int = 16,
) -> int:
    """Detections over a score sequence with the runtime's gating."""
    gate = ConsecutiveGate(
        threshold=threshold,
        consecutive=consecutive,
        debounce_windows=debounce_windows,
    )
    return sum(1 for s in scores if gate.update(float(s)))
