"""
Audio I/O utilities (numpy-native).

Capability parity with reference ``util/audio_util.py`` (audio_to_bct_tensor
universal loader, readers/writers, normalization) re-built without torch/PyAV:
WAV via the stdlib ``wave`` module, resampling via polyphase filtering
(scipy.signal.resample_poly), everything returned as numpy float32 in [-1, 1]
shaped ``(batch, channels, time)`` ready for ``jax.device_put``.
"""

from __future__ import annotations

import io
import os
import wave
from math import gcd
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "audio_to_bct_array",
    "read_wav",
    "write_wav",
    "resample_audio",
    "normalize_peak",
    "normalize_rms",
]

AudioLike = Union[str, bytes, np.ndarray, Sequence[Any]]


def read_wav(path_or_bytes: Union[str, bytes]) -> Tuple[np.ndarray, int]:
    """
    Read a WAV file (path or raw bytes) into float32 ``(channels, time)`` in [-1, 1].

    Supports 8/16/24/32-bit integer PCM (the stdlib wave module rejects
    IEEE-float WAVs; use utils.codecs.read_wav_any for those).
    """
    if isinstance(path_or_bytes, bytes):
        fileobj: Any = io.BytesIO(path_or_bytes)
    else:
        fileobj = path_or_bytes
    with wave.open(fileobj, "rb") as wav:
        n_channels = wav.getnchannels()
        sample_width = wav.getsampwidth()
        sample_rate = wav.getframerate()
        n_frames = wav.getnframes()
        raw = wav.readframes(n_frames)

    if sample_width == 1:  # unsigned 8-bit
        data = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        data = (data - 128.0) / 128.0
    elif sample_width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sample_width == 3:  # packed 24-bit
        as_bytes = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            as_bytes[:, 0].astype(np.int32)
            | (as_bytes[:, 1].astype(np.int32) << 8)
            | (as_bytes[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        data = ints.astype(np.float32) / float(1 << 23)
    elif sample_width == 4:
        # WAVE_FORMAT_IEEE_FLOAT is rare through the wave module; assume int32 PCM.
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {sample_width}")

    data = data.reshape(-1, n_channels).T  # (channels, time)
    return np.ascontiguousarray(data), sample_rate


def write_wav(
    path: str,
    audio: np.ndarray,
    sample_rate: int = 16000,
) -> None:
    """
    Write float32 audio in [-1, 1] (``(time,)``, ``(channels, time)``) as 16-bit PCM WAV.
    """
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[np.newaxis, :]
    if audio.ndim != 2:
        raise ValueError(f"Audio must be 1D or 2D, got {audio.ndim}D")
    clipped = np.clip(audio, -1.0, 1.0)
    pcm = (clipped * 32767.0).astype(np.int16)
    interleaved = pcm.T.reshape(-1)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with wave.open(path, "wb") as wav:
        wav.setnchannels(audio.shape[0])
        wav.setsampwidth(2)
        wav.setframerate(sample_rate)
        wav.writeframes(interleaved.tobytes())


def resample_audio(
    audio: np.ndarray,
    orig_rate: int,
    target_rate: int,
) -> np.ndarray:
    """Polyphase resampling along the last axis."""
    if orig_rate == target_rate:
        return audio
    from scipy.signal import resample_poly

    g = gcd(int(orig_rate), int(target_rate))
    up, down = target_rate // g, orig_rate // g
    return resample_poly(audio, up, down, axis=-1).astype(np.float32)


def _coerce_single(item: AudioLike, sample_rate: Optional[int]) -> Tuple[np.ndarray, Optional[int]]:
    """Coerce one item to (channels, time) float32 plus its native sample rate."""
    if isinstance(item, (str, bytes)):
        if isinstance(item, str) and os.path.splitext(item)[1].lower() not in (".wav", ".wave", ""):
            # Non-WAV containers (mp3/aac/ogg/flac/...) go through the codec
            # layer (ffmpeg-backed; reference util/audio_util.py:582-664).
            from heybuddy_tpu.utils.codecs import decode_audio

            return decode_audio(item, sample_rate=sample_rate)
        from heybuddy_tpu.utils.codecs import read_wav_any

        return read_wav_any(item)
    raw = np.asarray(item)
    arr = raw.astype(np.float32)
    if raw.dtype.kind == "i":
        # Integer PCM normalizes to [-1, 1] (reference audio_to_bct_tensor
        # divides int16 by 32768); leaving raw int ranges would be amplified
        # again by the featurizer's int16 rescale.
        arr /= float(np.iinfo(raw.dtype).max) + 1.0
    elif raw.dtype.kind == "u":
        half = (float(np.iinfo(raw.dtype).max) + 1.0) / 2.0
        arr = (arr - half) / half
    if arr.ndim == 1:
        arr = arr[np.newaxis, :]
    elif arr.ndim != 2:
        raise ValueError(f"Array audio must be 1D or 2D per item, got {arr.ndim}D")
    return arr, sample_rate


def audio_to_bct_array(
    audio: AudioLike,
    sample_rate: Optional[int] = None,
    source_sample_rate: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """
    Universal audio loader: file path(s), WAV bytes, numpy array(s), or nested lists
    become a float32 array of shape ``(batch, channels, time)`` in [-1, 1].

    Mirrors reference ``util/audio_util.py:73-145`` (audio_to_bct_tensor) with
    numpy instead of torch. When ``sample_rate`` is given, the audio is resampled
    to it; the returned rate is the final sample rate. ``source_sample_rate``
    declares the native rate of raw-array inputs (defaults to ``sample_rate``).
    """
    items: List[AudioLike]
    if isinstance(audio, (str, bytes)):
        items = [audio]
    elif isinstance(audio, np.ndarray):
        if audio.ndim == 3:
            items = list(audio)  # (batch, channels, time)
        elif audio.ndim == 2:
            items = list(audio)  # (batch, time) mono clips
        else:
            items = [audio]
    elif isinstance(audio, Sequence):
        if len(audio) > 0 and isinstance(audio[0], (int, float, np.floating, np.integer)):
            items = [np.asarray(audio, dtype=np.float32)]
        else:
            items = list(audio)
    else:
        raise TypeError(f"Unsupported audio input type: {type(audio)}")

    coerced: List[np.ndarray] = []
    final_rate = sample_rate
    for item in items:
        arr, native_rate = _coerce_single(item, source_sample_rate or sample_rate)
        if sample_rate is not None and native_rate is not None and native_rate != sample_rate:
            arr = resample_audio(arr, native_rate, sample_rate)
        elif final_rate is None:
            final_rate = native_rate
        elif native_rate is not None and native_rate != final_rate:
            # No target rate given and the batch mixes native rates: conform
            # to the first item's rate (a single rate is returned for the
            # whole batch, so leaving items unresampled silently distorts
            # their duration/pitch downstream).
            arr = resample_audio(arr, native_rate, final_rate)
        coerced.append(arr.astype(np.float32))

    max_channels = max(a.shape[0] for a in coerced)
    max_time = max(a.shape[1] for a in coerced)
    batch = np.zeros((len(coerced), max_channels, max_time), dtype=np.float32)
    for i, arr in enumerate(coerced):
        c, t = arr.shape
        if c < max_channels:  # mono → repeat across channels
            arr = np.broadcast_to(arr.mean(axis=0, keepdims=True), (max_channels, t))
        batch[i, :, :t] = arr
    return batch, int(final_rate or 16000)


def normalize_peak(audio: np.ndarray, peak: float = 0.95) -> np.ndarray:
    """Scale so the maximum absolute sample equals ``peak`` (no-op on silence)."""
    current = np.max(np.abs(audio))
    if current < 1e-9:
        return audio
    return (audio * (peak / current)).astype(np.float32)


def normalize_rms(audio: np.ndarray, rms_db: float = -20.0) -> np.ndarray:
    """Scale to a target RMS level in dBFS (no-op on silence)."""
    current = np.sqrt(np.mean(np.square(audio)))
    if current < 1e-9:
        return audio
    target = 10.0 ** (rms_db / 20.0)
    return (audio * (target / current)).astype(np.float32)
