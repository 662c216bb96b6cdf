"""VAD hysteresis validation on a synthetic speech corpus.

The reference's runtime gates wake-word inference on a Silero VAD with
0.65 / 0.4 / 8-frame hysteresis (browser vad.ts:108-141). This framework's
offline default is an adaptive-energy VAD; these tests validate that the
shared VADGate state machine with the energy VAD's calibrated operating
point (0.5 / 0.25 / 8) behaves correctly on actual (formant-synthesized)
speech: fast onset, no flapping inside a phrase, bounded release after it.
"""

import numpy as np
import pytest

from heybuddy_tpu.models.formant import FormantSynthesizer
from heybuddy_tpu.models.vad import EnergyVAD, VADGate

FRAME = 320  # 20 ms @ 16 kHz, the runtime's frame size
SR = 16000


def run_gate(audio: np.ndarray, seed_frames: int = 50, noise_rms: float = 3e-4):
    """Feed ``audio`` through EnergyVAD+gate after settling the noise floor."""
    rng = np.random.default_rng(0)
    gate = VADGate(EnergyVAD(), positive_threshold=0.5,
                   negative_threshold=0.25, silent_frames_to_stop=8)
    # settle the adaptive floor on ambient noise first (runtime warm-up)
    for _ in range(seed_frames):
        gate.update(rng.normal(0, noise_rms, FRAME).astype(np.float32))
    assert not gate.speaking
    states = []
    for i in range(0, len(audio) - FRAME + 1, FRAME):
        states.append(gate.update(audio[i : i + FRAME]))
    return np.asarray(states, dtype=bool)


@pytest.fixture(scope="module")
def phrase_audio():
    synth = FormantSynthesizer()
    clip = synth.synthesize("hey buddy how are you", speaker=1)
    return np.asarray(clip, dtype=np.float32)


def test_gate_detects_speech_onset_quickly(phrase_audio):
    rng = np.random.default_rng(1)
    lead = rng.normal(0, 3e-4, SR).astype(np.float32)  # 1 s ambient lead-in
    audio = np.concatenate([lead, phrase_audio])
    states = run_gate(audio)
    onset_frame = int(np.argmax(states))
    # speech starts at frame 50 (1 s); the gate must open within 10 frames
    # (200 ms) of actual onset
    assert states.any()
    assert abs(onset_frame - SR // FRAME) <= 10


def test_gate_holds_through_intra_phrase_gaps(phrase_audio):
    """The 8-frame hold keeps the gate open across word boundaries."""
    states = run_gate(phrase_audio)
    opened = np.flatnonzero(states)
    assert opened.size > 0
    active = states[opened[0] : opened[-1] + 1]
    # no release inside the phrase: once open, stays open to the last frame
    assert active.all()


def test_gate_releases_after_phrase(phrase_audio):
    rng = np.random.default_rng(2)
    tail = rng.normal(0, 3e-4, 2 * SR).astype(np.float32)  # 2 s trailing ambient
    audio = np.concatenate([phrase_audio, tail])
    states = run_gate(audio)
    assert states.any()
    # gate must be closed by the end of the trailing silence...
    assert not states[-1]
    # ...and release within 8 frames + 500 ms of the phrase end
    phrase_frames = len(phrase_audio) // FRAME
    release = len(states) - int(np.argmax(states[::-1]))  # last open frame + 1
    assert release <= phrase_frames + 8 + SR // FRAME // 2


def test_gate_ignores_single_frame_click():
    """A one-frame transient must not open the gate for long / at all in
    steady state: even if it crosses the positive threshold momentarily, the
    gate closes again within the hold window."""
    rng = np.random.default_rng(3)
    audio = rng.normal(0, 3e-4, 3 * SR).astype(np.float32)
    click_at = SR
    audio[click_at : click_at + FRAME] += (
        0.5 * np.sin(2 * np.pi * 1000 * np.arange(FRAME) / SR)
    ).astype(np.float32)
    states = run_gate(audio)
    # open at most for the click frame + the 8-frame hold
    assert states.sum() <= 9


def test_gate_probability_passthrough():
    """Gate accepts raw probabilities when no VAD model is attached."""
    gate = VADGate(positive_threshold=0.65, negative_threshold=0.4,
                   silent_frames_to_stop=3)
    seq = [0.2, 0.7, 0.5, 0.39, 0.39, 0.45, 0.3, 0.3, 0.3, 0.1]
    out = [gate.update(p) for p in seq]
    #      ^closed ^open  hold  dips reset by 0.45, then 3 lows close it
    assert out == [False, True, True, True, True, True, True, True, False, False]
