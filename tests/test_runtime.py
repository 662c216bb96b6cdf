"""Runtime layer: timecode de-duplication, model thread, listen loop."""

import os
import time

import numpy as np
import pytest

from heybuddy_tpu.models.wakeword import WakeWordInferenceMixin, WakeWordMLPModel


class StubTimecodeModel(WakeWordInferenceMixin):
    """Inference mixin host with scripted per-window scores."""

    def __init__(self, scores):
        self.scores = list(scores)

    def predict(self, audio, threshold=0.5, return_scores=False, **kwargs):
        if return_scores:
            return tuple(self.scores)
        return tuple(s > threshold for s in self.scores)


def _seconds(n):
    return np.zeros(16000 * n, dtype=np.float32)


def test_predict_timecodes_deduplicates_adjacent_hits(monkeypatch):
    # 5 windows of a 4 s clip (padded + 1 s silence each side).
    # Reference semantics (wakeword.py:103-113): a hit followed by a hit
    # reports i+0.5; a final-window hit preceded by a hit is dropped.
    model = StubTimecodeModel([0, 1, 1, 0, 0])
    times = model.predict_timecodes(_seconds(4))
    assert times == [1.5, 2.0]

    model = StubTimecodeModel([1, 0, 0, 1, 0])
    times = model.predict_timecodes(_seconds(4))
    assert times == [0.0, 3.0]

    model = StubTimecodeModel([0, 0, 0, 1, 1])
    times = model.predict_timecodes(_seconds(4))
    assert times == [3.5]


def test_predict_sliding_context_over_long_audio():
    """predict() on >1.44 s audio slides the 16-frame context (max over windows)."""
    model = WakeWordMLPModel(num_layers=0)
    audio = np.random.default_rng(0).normal(0, 0.1, (2, 32000)).astype(np.float32)
    scores = model.predict(audio, return_scores=True)
    assert len(scores) == 2
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_model_thread_roundtrip(tmp_path):
    model = WakeWordMLPModel(num_layers=0)
    path = str(tmp_path / "m.npz")
    model.save(path)

    from heybuddy_tpu.runtime.model_thread import WakeWordModelThread

    thread = WakeWordModelThread(path)
    try:
        audio = np.random.default_rng(1).normal(0, 0.1, 23040).astype(np.float32)
        thread.put(audio)
        score, duration = thread.get(timeout=60)
        assert 0.0 <= score <= 1.0
        assert duration > 0
    finally:
        thread.stop()


def test_listen_on_wav(tmp_path, monkeypatch):
    from heybuddy_tpu.runtime.listen import run_listen
    from heybuddy_tpu.utils.audio_io import write_wav

    monkeypatch.setenv("HEYBUDDY_LISTEN_SERIAL", "1")
    model = WakeWordMLPModel(num_layers=0)
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    wav = str(tmp_path / "audio.wav")
    write_wav(wav, np.random.default_rng(2).normal(0, 0.1, 64000).astype(np.float32))

    detections = run_listen([ckpt], threshold=0.0, buffer_size=16000, input_wav=wav, max_chunks=3)
    # threshold 0 means every frame with any score > 0 detects
    assert len(detections) >= 1


def test_listen_vad_gate_skips_silence(tmp_path, monkeypatch):
    """With use_vad, silent chunks skip inference; speech chunks still score."""
    from heybuddy_tpu.models.formant import FormantSynthesizer
    from heybuddy_tpu.runtime.listen import run_listen
    from heybuddy_tpu.utils.audio_io import write_wav

    monkeypatch.setenv("HEYBUDDY_LISTEN_SERIAL", "1")
    model = WakeWordMLPModel(num_layers=0)
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)

    synth = FormantSynthesizer()
    clip = synth.synthesize("hey buddy how are you", speaker=3)
    rng = np.random.default_rng(0)
    ambient = rng.normal(0, 3e-4, 32000).astype(np.float32)
    audio = np.concatenate([ambient, clip, ambient])
    wav = str(tmp_path / "gated.wav")
    write_wav(wav, audio, 16000)

    # all-silence input: the gate never opens -> zero detections even at thr 0
    silent_wav = str(tmp_path / "silent.wav")
    write_wav(silent_wav, rng.normal(0, 3e-4, 64000).astype(np.float32), 16000)
    silent = run_listen([ckpt], threshold=0.0, buffer_size=8000,
                        input_wav=silent_wav, use_vad=True)
    assert silent == []

    # speech input: the gate opens and inference runs (thr 0 -> detections)
    speech = run_listen([ckpt], threshold=0.0, buffer_size=8000,
                        input_wav=wav, use_vad=True)
    assert len(speech) >= 1
