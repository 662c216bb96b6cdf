"""
Real-time listening loop (reference __main__.py:466-597 ``heybuddy listen``).

Feeds a rolling 2 s audio buffer from the microphone (pyaudio, when available)
or from a wav file (``--input-wav``, also the CI path) to one
WakeWordModelThread per checkpoint, rendering an ANSI score table with
per-model latency.
"""

from __future__ import annotations

import os
import queue
import sys
import time
from typing import Iterator, List, Optional

import numpy as np

from heybuddy_tpu.constants import SAMPLE_RATE
from heybuddy_tpu.runtime.model_thread import WakeWordModelThread
from heybuddy_tpu.utils.audio_io import resample_audio
from heybuddy_tpu.utils.codecs import read_wav_any
from heybuddy_tpu.utils.log import logger

__all__ = ["run_listen"]

ROLLING_SAMPLES = 32000  # 2 s at 16 kHz, like the reference listener


def _mic_chunks(buffer_size: int) -> Iterator[np.ndarray]:
    try:
        import pyaudio  # type: ignore[import-not-found]
    except ImportError as ex:
        raise RuntimeError(
            "pyaudio is required for microphone listening; "
            "use --input-wav to stream a file instead"
        ) from ex
    pa = pyaudio.PyAudio()
    stream = pa.open(
        format=pyaudio.paInt16,
        channels=1,
        rate=SAMPLE_RATE,
        input=True,
        frames_per_buffer=buffer_size,
    )
    try:
        while True:
            data = stream.read(buffer_size, exception_on_overflow=False)
            yield np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0
    finally:
        stream.stop_stream()
        stream.close()
        pa.terminate()


def _wav_chunks(path: str, buffer_size: int, realtime: bool = False) -> Iterator[np.ndarray]:
    audio, rate = read_wav_any(path)
    mono = audio.mean(axis=0)
    if rate != SAMPLE_RATE:
        mono = resample_audio(mono, rate, SAMPLE_RATE)
    for start in range(0, len(mono), buffer_size):
        chunk = mono[start : start + buffer_size]
        if realtime:
            time.sleep(len(chunk) / SAMPLE_RATE)
        yield chunk


def _use_serial_inference() -> bool:
    """
    Some remote-device backends (e.g. tunneled single-chip setups) only
    support device compute from the main thread; evaluate models inline there.
    """
    if os.environ.get("HEYBUDDY_LISTEN_SERIAL") == "1":
        return True
    # Threaded inference is opt-in: device batching already makes one thread
    # fast, and remote-tunneled backends crash on worker-thread compute.
    return os.environ.get("HEYBUDDY_LISTEN_THREADS") != "1"


class _SerialModel:
    """Main-thread drop-in for WakeWordModelThread."""

    def __init__(self, checkpoint_path: str, threshold: float = 0.5) -> None:
        from heybuddy_tpu.cli import _load_any_model

        self._model = _load_any_model(checkpoint_path)
        self._pending: Optional[np.ndarray] = None
        self.threshold = threshold

    def put(self, audio: np.ndarray) -> None:
        self._pending = audio

    def get(self, timeout: Optional[float] = None) -> tuple:
        start = time.perf_counter()
        scores = self._model.predict(self._pending, return_scores=True)
        return (float(scores[0]) if scores else 0.0, time.perf_counter() - start)

    def stop(self) -> None:
        pass


def run_listen(
    checkpoints: List[str],
    threshold: float = 0.5,
    buffer_size: int = 4096,
    input_wav: Optional[str] = None,
    max_chunks: Optional[int] = None,
    use_vad: bool = False,
    consecutive: int = 1,
) -> List[str]:
    """Run the listen loop; returns lines of detections (for testing).

    ``use_vad`` gates inference on a VAD hysteresis like the reference's
    browser runtime (vad.ts:108-141): chunks while no speech is active (and
    none was active within the rolling buffer) skip the wake-word models
    entirely — the dominant idle-power saving on always-on devices.

    ``consecutive`` requires that many successive chunks to score above the
    threshold before a detection is recorded (runtime/detection.py) —
    ``1`` reproduces the reference's fire-on-any-window behavior.
    """
    from heybuddy_tpu.runtime.detection import ConsecutiveGate
    if _use_serial_inference():
        models: List = [_SerialModel(path, threshold=threshold) for path in checkpoints]
    else:
        models = [WakeWordModelThread(path, threshold=threshold) for path in checkpoints]
    names = [os.path.splitext(os.path.basename(p))[0] for p in checkpoints]
    rolling = np.zeros(ROLLING_SAMPLES, dtype=np.float32)
    detections: List[str] = []
    # debounce_windows=0 keeps the historical per-chunk logging; the gate
    # only adds the consecutive-chunk requirement.
    score_gates = [
        ConsecutiveGate(threshold=threshold, consecutive=consecutive, debounce_windows=0)
        for _ in names
    ]
    is_tty = sys.stdout.isatty()

    gate = None
    speech_cooldown = 0
    if use_vad:
        from heybuddy_tpu.models.vad import EnergyVAD, VADGate, get_vad_model

        vad = get_vad_model()
        if isinstance(vad, EnergyVAD):
            gate = VADGate(vad, positive_threshold=0.5, negative_threshold=0.25)
        else:
            gate = VADGate(vad)

    chunks = _wav_chunks(input_wav, buffer_size) if input_wav else _mic_chunks(buffer_size)
    try:
        for i, chunk in enumerate(chunks):
            if max_chunks is not None and i >= max_chunks:
                break
            if len(chunk) >= ROLLING_SAMPLES:
                rolling = chunk[-ROLLING_SAMPLES:].astype(np.float32).copy()
            else:
                rolling = np.roll(rolling, -len(chunk))
                rolling[-len(chunk) :] = chunk
            if gate is not None:
                # OR across the chunk's frames: speech fully contained in one
                # chunk (started and released before chunk end) must still
                # score, not just speech active at the final frame.
                speaking = False
                for f in range(0, len(chunk) - 319, 320):  # 20 ms VAD frames
                    speaking = gate.update(chunk[f : f + 320]) or speaking
                if speaking:
                    # keep scoring until the speech has rolled out of the buffer
                    speech_cooldown = ROLLING_SAMPLES // max(len(chunk), 1) + 1
                elif speech_cooldown > 0:
                    speech_cooldown -= 1
                else:
                    # Window strides still elapse while skipped: feed silence
                    # so a pre-silence score spike can't pair with the first
                    # post-silence spike as a "consecutive" run.
                    for score_gate in score_gates:
                        score_gate.update(0.0)
                    if is_tty:
                        sys.stdout.write("\x1b[2J\x1b[H(listening — no speech)\n")
                        sys.stdout.flush()
                    continue
            for model in models:
                model.put(rolling.copy())
            rows = []
            for name, model, score_gate in zip(names, models, score_gates):
                try:
                    score, duration = model.get(timeout=10.0)
                except queue.Empty:
                    # Late result (e.g. first-prediction compile); the model
                    # thread discards it by sequence tag on the next get().
                    score, duration = 0.0, 0.0
                flag = "*" if score >= threshold else " "
                rows.append(f"{flag} {name:<30} {score:6.3f}  {duration * 1000:7.1f}ms")
                if score_gate.update(score):
                    stamp = i * buffer_size / SAMPLE_RATE
                    detections.append(f"{name} @ {stamp:.2f}s score={score:.3f}")
            if is_tty:
                sys.stdout.write("\x1b[2J\x1b[H" + "\n".join(rows) + "\n")
                sys.stdout.flush()
    except KeyboardInterrupt:
        logger.info("Interrupted")
    finally:
        for model in models:
            model.stop()
    for line in detections:
        print(line)
    return detections
