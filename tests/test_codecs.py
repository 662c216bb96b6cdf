"""Codec + loudness layer (reference util/audio_util.py:197-772 parity)."""

import io
import struct
import wave

import numpy as np
import pytest

from heybuddy_tpu.utils.audio_io import audio_to_bct_array, write_wav
from heybuddy_tpu.utils.codecs import (
    compress_roundtrip,
    decode_audio,
    encode_audio,
    ffmpeg_available,
    measure_loudness,
    normalize_loudness,
    read_wav_any,
)


def _sine(freq=440.0, seconds=1.0, rate=16000, amp=0.5):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _float_wav_bytes(audio: np.ndarray, rate: int) -> bytes:
    """Hand-roll an IEEE-float WAV (stdlib wave cannot write format 3)."""
    data = audio.astype(np.float32).tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_read_float_wav():
    audio = _sine()
    raw = _float_wav_bytes(audio, 16000)
    decoded, rate = read_wav_any(raw)
    assert rate == 16000
    np.testing.assert_allclose(decoded[0], audio, atol=1e-6)


def test_read_pcm_wav_through_read_wav_any(tmp_path):
    audio = _sine()
    path = str(tmp_path / "pcm.wav")
    write_wav(path, audio, 16000)
    decoded, rate = read_wav_any(path)
    assert rate == 16000
    np.testing.assert_allclose(decoded[0], audio, atol=1e-3)


def test_audio_to_bct_handles_float_wav(tmp_path):
    audio = _sine()
    path = str(tmp_path / "float.wav")
    with open(path, "wb") as f:
        f.write(_float_wav_bytes(audio, 16000))
    batch, rate = audio_to_bct_array(path, sample_rate=16000)
    assert batch.shape == (1, 1, len(audio))


def test_decode_non_wav_without_ffmpeg_raises(tmp_path):
    if ffmpeg_available():
        pytest.skip("ffmpeg present; error path not reachable")
    path = str(tmp_path / "clip.mp3")
    with open(path, "wb") as f:
        f.write(b"\xff\xfb\x90\x00" * 100)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        decode_audio(path)


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg not on PATH")
def test_mp3_roundtrip_preserves_signal():
    audio = _sine(seconds=0.5)
    out = compress_roundtrip(audio, 16000, codec="mp3", bitrate="128k")
    assert out.shape[-1] == audio.shape[-1]
    # correlation, not equality: mp3 is lossy
    corr = np.corrcoef(out[..., 1000:-1000].ravel(), audio[1000:-1000])[0, 1]
    assert corr > 0.9


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg not on PATH")
def test_encode_decode_ogg(tmp_path):
    audio = _sine(seconds=0.5)
    path = str(tmp_path / "clip.ogg")
    encode_audio(path, audio, 16000)
    decoded, rate = decode_audio(path, sample_rate=16000)
    assert rate == 16000 and decoded.shape[-1] > 0


def test_loudness_sine_calibration():
    """BS.1770: a 997 Hz 0 dBFS sine reads ~-3.01 LUFS at unity weighting."""
    audio = _sine(freq=997.0, seconds=2.0, amp=1.0)
    lufs = measure_loudness(audio, 16000)
    assert lufs == pytest.approx(-3.01, abs=0.6)


def test_loudness_gain_linearity():
    audio = _sine(seconds=2.0, amp=0.5)
    l1 = measure_loudness(audio, 16000)
    l2 = measure_loudness(audio * 0.5, 16000)
    assert l1 - l2 == pytest.approx(6.02, abs=0.1)


def test_loudness_gating_ignores_silence():
    """Appending silence barely moves integrated loudness (gating), while the
    ungated mean power would collapse by ~6 dB."""
    speechy = _sine(seconds=1.0, amp=0.5)
    padded = np.concatenate([speechy, np.zeros(16000 * 3, np.float32)])
    l1 = measure_loudness(speechy, 16000)
    l2 = measure_loudness(padded, 16000)
    # only boundary blocks shift the result; 4x duration = -6 dB ungated
    assert abs(l1 - l2) < 1.0
    assert measure_loudness(np.zeros(16000 * 2, np.float32), 16000) == -70.0


def test_normalize_loudness_hits_target():
    audio = _sine(seconds=2.0, amp=0.1)
    out = normalize_loudness(audio, 16000, target_lufs=-23.0)
    assert measure_loudness(out, 16000) == pytest.approx(-23.0, abs=0.3)


def test_normalize_loudness_respects_peak_ceiling():
    audio = _sine(seconds=2.0, amp=0.01)
    out = normalize_loudness(audio, 16000, target_lufs=0.0, max_peak=0.9)
    assert np.max(np.abs(out)) <= 0.9 + 1e-6
