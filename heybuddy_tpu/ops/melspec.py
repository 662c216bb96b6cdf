"""
Mel spectrogram as pure MXU work.

TPU-native replacement for the reference's ONNX mel-spectrogram model
(reference spectrogram.py:12-41, an exported torchaudio MelSpectrogram, with
``x/10 + 2`` post-scaling). Instead of an FFT, the short frame size
(n_fft=512) makes a *matmul DFT* optimal on TPU: frames are extracted with a
patch op, multiplied by a precomputed windowed DFT basis ``(512, 2*257)`` on
the MXU, squared/summed into power, and projected through the mel filterbank
``(257, 32)`` — three dense matmuls that XLA fuses tightly, no FFT butterflies,
no dynamic shapes.

Frame-count contract (reference embeddings.py:67): with hop 160 and
center=False, ``n_frames = (t - 512)//160 + 1`` which equals the reference's
``ceil(t/160 - 3)`` for all the shapes in its test suite
(17280 -> 105, 23040 -> 141).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import (
    MEL_BINS,
    MEL_F_MAX,
    MEL_F_MIN,
    MEL_HOP_LENGTH,
    MEL_LOG_EPS,
    MEL_N_FFT,
    MEL_SCALE_ADD,
    MEL_SCALE_DIV,
    MEL_WIN_LENGTH,
    SAMPLE_RATE,
)

__all__ = [
    "num_frames",
    "mel_filterbank",
    "dft_basis",
    "frame_audio",
    "mel_spectrogram",
]


def num_frames(num_samples: int, n_fft: int = MEL_N_FFT, hop: int = MEL_HOP_LENGTH) -> int:
    """Frame count for center=False framing; matches reference ceil(t/160 - 3)."""
    if num_samples < n_fft:
        return 0
    return (num_samples - n_fft) // hop + 1


def _hz_to_mel(hz: np.ndarray) -> np.ndarray:
    """HTK mel scale (torchaudio default mel_scale='htk')."""
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_mels: int = MEL_BINS,
    n_fft: int = MEL_N_FFT,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = MEL_F_MIN,
    f_max: float = MEL_F_MAX,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape (n_fft//2 + 1, n_mels), float32."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(f_min)), _hz_to_mel(np.array(f_max)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_freqs, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lower, center, upper = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lower) / max(center - lower, 1e-12)
        down = (upper - freqs) / max(upper - center, 1e-12)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dft_basis(
    n_fft: int = MEL_N_FFT,
    win_length: int = MEL_WIN_LENGTH,
    n_freqs: Optional[int] = None,
) -> np.ndarray:
    """
    Windowed real-DFT basis, shape (n_fft, 2*n_freqs).

    Column block [0, n_freqs) is the cosine part, [n_freqs, 2*n_freqs) the sine
    part, each pre-multiplied by a Hann window of ``win_length`` centered in the
    n_fft frame (torchaudio pads the window symmetrically to n_fft). One matmul
    against this basis produces both DFT components. ``n_freqs`` below the full
    n_fft//2+1 truncates to the low-frequency band (see :func:`mel_band_freqs`).
    """
    if n_freqs is None:
        n_freqs = n_fft // 2 + 1
    window = np.hanning(win_length + 1)[:win_length]  # periodic hann, torch.hann_window
    padded = np.zeros(n_fft)
    left = (n_fft - win_length) // 2
    padded[left : left + win_length] = window

    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (padded[:, None] * basis).astype(np.float32)


@functools.lru_cache(maxsize=None)
def mel_band_freqs(
    n_fft: int = MEL_N_FFT,
    sample_rate: int = SAMPLE_RATE,
    f_max: float = MEL_F_MAX,
) -> int:
    """
    Number of DFT bins actually covered by the mel filterbank. Frequencies
    above ``f_max`` (3.8 kHz of the 8 kHz Nyquist band) receive zero mel
    weight, so the DFT matmul can drop them exactly — roughly halving the
    dominant matmul of the featurization pipeline. Rounded up to a multiple
    of 8 for clean VPU/MXU tiling.
    """
    bins = int(np.ceil(f_max / (sample_rate / 2) * (n_fft // 2))) + 2
    return min(((bins + 7) // 8) * 8, n_fft // 2 + 1)


def frame_audio(
    audio: jax.Array,
    n_fft: int = MEL_N_FFT,
    hop: int = MEL_HOP_LENGTH,
) -> jax.Array:
    """
    Extract overlapping frames: (batch, t) -> (batch, n_frames, n_fft).

    Fast path ("hop stacking"): when ``t`` is a whole number of hops, reshape
    the signal into hops and concatenate ceil(n_fft/hop) shifted views — pure
    layout ops, no gather. Falls back to conv_general_dilated_patches for
    irregular lengths.
    """
    b, t = audio.shape
    n = num_frames(t, n_fft, hop)
    hops_per_frame = -(-n_fft // hop)  # ceil
    if t % hop == 0 and (n - 1) + hops_per_frame <= t // hop:
        hops = audio.reshape(b, t // hop, hop)
        parts = [hops[:, k : k + n, :] for k in range(hops_per_frame)]
        stacked = jnp.concatenate(parts, axis=-1)  # (b, n, hops_per_frame*hop)
        return stacked[:, :, :n_fft]
    frames = jax.lax.conv_general_dilated_patches(
        audio[:, None, :],  # (b, 1, t) NCW
        filter_shape=(n_fft,),
        window_strides=(hop,),
        padding="VALID",
    )  # -> (b, n_fft, n_frames)
    return jnp.transpose(frames, (0, 2, 1))


def mel_spectrogram(
    audio: jax.Array,
    n_mels: int = MEL_BINS,
    n_fft: int = MEL_N_FFT,
    win_length: int = MEL_WIN_LENGTH,
    hop: int = MEL_HOP_LENGTH,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = MEL_F_MIN,
    f_max: float = MEL_F_MAX,
    eps: float = MEL_LOG_EPS,
    compute_dtype: Optional[jnp.dtype] = None,
    precision: Optional[jax.lax.Precision] = None,
) -> jax.Array:
    """
    Log-mel spectrogram with the reference's output scaling applied.

    (batch, t) float32 audio in int16-range values -> (batch, n_frames, n_mels).
    The returned values already include the reference's ``log-mel/10 + 2``
    post-processing (reference spectrogram.py:32), so downstream consumers see
    the same numeric range the reference classifier was built around (~[-1, 4]).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    b, t = audio.shape
    # Exact band truncation: bins above f_max carry zero mel weight, so the
    # DFT only computes the covered low band (~124 of 257 bins by default).
    n_freqs = mel_band_freqs(n_fft, sample_rate, f_max)

    frames = frame_audio(audio, n_fft=n_fft, hop=hop)  # (b, F, n_fft)
    basis = jnp.asarray(dft_basis(n_fft, win_length, n_freqs))
    if compute_dtype is not None:
        frames = frames.astype(compute_dtype)
        basis = basis.astype(compute_dtype)

    if precision is None:
        # bf16_3x (~21 mantissa bits): int16-range audio splits exactly into
        # two bf16 halves, so accuracy is within ~1e-5 of full f32 while the
        # MXU runs 3 bf16 passes instead of f32 emulation.
        precision = jax.lax.Precision.HIGH

    # One MXU matmul yields cos and sin components together: (b, F, 2*n_freqs)
    spectrum = jax.lax.dot_general(
        frames,
        basis,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    re, im = spectrum[..., :n_freqs], spectrum[..., n_freqs:]
    power = re * re + im * im  # (b, F, n_freqs)

    fb = jnp.asarray(
        mel_filterbank(n_mels, n_fft, sample_rate, f_min, f_max)[:n_freqs]
    )
    mel = jax.lax.dot_general(
        power,
        fb,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logmel = jnp.log(mel + eps)
    return logmel / MEL_SCALE_DIV + MEL_SCALE_ADD
