"""
Device-rendered formant TTS (models/formant_device.py) vs the host renderer.

The planner reuses the host synthesizer's segment/track/phase code verbatim,
so both backends render the SAME utterance plan; these tests hold the device
output to close log-mel agreement with the host output, and pin the device
path's determinism and batching invariants.
"""

import numpy as np
import pytest

from heybuddy_tpu.models.formant import FormantSynthesizer
from heybuddy_tpu.models.formant_device import (
    DEFAULT_HARMONICS,
    MAX_NOISE_SEGMENTS,
    NOISE_FFT,
    DeviceFormantPlanner,
    _dft_matrices,
    render_batch,
)

L_MAX = 24000  # 1.5 s: small compiled shape keeps CPU test compiles fast
TEXTS = ["hey buddy", "good morning", "she sells sea shells", "bunny"]


@pytest.fixture(scope="module")
def planner():
    return DeviceFormantPlanner(max_samples=L_MAX)


@pytest.fixture(scope="module")
def rendered(planner):
    """Render the module's texts once on device + host."""
    host = FormantSynthesizer()
    plans, host_clips = [], []
    for i, text in enumerate(TEXTS):
        plan = planner.plan(text, speaker=i, seed=1234 + i)
        assert plan is not None, text
        plans.append(plan)
        host_clips.append(host.synthesize(text, speaker=i, seed=1234 + i))
    device_clips = render_batch(plans, l_max=L_MAX)
    return plans, device_clips, host_clips


def _logmel(audio: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from heybuddy_tpu.ops.melspec import mel_spectrogram

    pad = np.zeros(23040, np.float32)
    pad[: min(len(audio), 23040)] = audio[:23040]
    return np.asarray(mel_spectrogram(jnp.asarray(pad[None] * 32768.0)))[0]


def test_dft_matrices_match_numpy_fft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, NOISE_FFT)).astype(np.float32)
    dft_c, dft_s, idft_re, idft_im = _dft_matrices(NOISE_FFT)
    re, im = x @ dft_c, x @ dft_s
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(re, ref.real, atol=1e-3)
    np.testing.assert_allclose(im, ref.imag, atol=1e-3)
    # irfft round trip
    back = re @ idft_re + im @ idft_im
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_same_plan_same_length(rendered):
    plans, device_clips, host_clips = rendered
    for plan, dev, host in zip(plans, device_clips, host_clips):
        assert len(dev) == plan.length == len(host)
        assert dev.dtype == np.float32
        assert np.abs(dev).max() <= 0.7 + 1e-5
        assert np.abs(dev).max() > 0.1  # actually rendered something


def test_device_render_matches_host_spectrally(rendered):
    """Per-clip log-mel correlation: the voiced tracks are identical and the
    noise residue is statistically matched, so frames should correlate
    strongly between backends."""
    _, device_clips, host_clips = rendered
    for dev, host in zip(device_clips, host_clips):
        m_dev, m_host = _logmel(dev), _logmel(host)
        # frames where both backends have spectral structure (skip silence)
        active = (m_host.std(axis=-1) > 0.1) & (m_dev.std(axis=-1) > 0.1)
        assert active.sum() > 10
        idx = np.flatnonzero(active)
        corr = np.array([
            np.corrcoef(m_dev[i], m_host[i])[0, 1] for i in idx
        ])
        assert np.mean(corr) > 0.9, float(np.mean(corr))
        # overall level agreement (log-mel units)
        energy_rmse = np.sqrt(np.mean(
            (m_dev[idx].mean(-1) - m_host[idx].mean(-1)) ** 2))
        assert energy_rmse < 0.5, float(energy_rmse)


def test_render_deterministic_and_batch_independent(planner):
    plan = planner.plan("hey buddy", speaker=3, seed=99)
    other = planner.plan("good morning", speaker=5, seed=7)
    solo = render_batch([plan], l_max=L_MAX)[0]
    again = render_batch([plan], l_max=L_MAX)[0]
    in_batch = render_batch([other, plan], l_max=L_MAX, pad_to=8)[1]
    np.testing.assert_array_equal(solo, again)
    np.testing.assert_allclose(solo, in_batch, atol=1e-5)


def test_speaker_changes_output(planner):
    a = planner.plan("hey buddy", speaker=0, seed=5)
    b = planner.plan("hey buddy", speaker=42, seed=5)
    clips = render_batch([a, b], l_max=L_MAX)
    assert len(clips[0]) != len(clips[1]) or not np.allclose(clips[0], clips[1])


def test_planner_falls_back_for_long_text(planner):
    long_text = " ".join(["fundamental counterrevolutionaries"] * 6)
    assert planner.plan(long_text, speaker=0, seed=0) is None


def test_noise_table_bounds(planner):
    plan = planner.plan("hey buddy", speaker=0, seed=0)
    assert plan is not None
    assert plan.noise_table.shape == (MAX_NOISE_SEGMENTS, 9)
    # at least one fricative band segment present with a positive level
    assert (plan.noise_table[:, 2] > 0).any()


def test_device_backend_via_tts_contract():
    from heybuddy_tpu.models.tts import DeviceFormantTTS

    tts = DeviceFormantTTS(max_samples=L_MAX, harmonics=48)
    samples = tts(["hey buddy"], num_samples=3, batch_size=3, seed=11)
    assert len(samples) == 3
    for text, pcm in samples:
        assert text == "hey buddy"
        assert pcm.dtype == np.int16
        assert len(pcm) > 2000
        assert np.abs(pcm).max() > 8000  # peak-normalized int16


def test_plan_mode_guards():
    from heybuddy_tpu.models.tts import DeviceFormantTTS, FormantTTS

    host = FormantTTS(num_speakers=8)
    assert not host.supports_plans
    with pytest.raises(NotImplementedError):
        host.plan_batch(["hi"], [(0, 0)], 0.0, 1.0, 0.667, 1.0, 0)
    dev = DeviceFormantTTS(max_samples=L_MAX, harmonics=32)
    assert dev.supports_plans
    with pytest.raises(ValueError):
        dev(["hey buddy"], num_samples=1, as_plans=True, trim_silence=True)
    with pytest.raises(ValueError):
        dev(["hey buddy"], num_samples=1, as_plans=True, target_sample_rate=8000)
    plans = dev(["hey buddy"], num_samples=2, batch_size=2, as_plans=True, seed=1)
    assert len(plans) == 2
    for text, item in plans:
        assert text == "hey buddy"
        assert not isinstance(item, np.ndarray)  # ClipPlan, not audio


def test_get_tts_model_caches_per_backend():
    from heybuddy_tpu.models import tts as tts_mod

    host = tts_mod.get_tts_model(backend="formant")
    dev = tts_mod.get_tts_model(backend="formant-device")
    assert isinstance(host, tts_mod.FormantTTS)
    assert isinstance(dev, tts_mod.DeviceFormantTTS)
    assert tts_mod.get_tts_model(backend="device") is dev
    assert tts_mod.get_tts_model(backend="formant") is host


def test_default_harmonics_cover_nyquist():
    # lowest speaker f0 is ~85 Hz after declination; DEFAULT_HARMONICS must
    # reach the 8 kHz band edge for the brightest fricative-adjacent vowels
    assert DEFAULT_HARMONICS * 85.0 > 8000.0
