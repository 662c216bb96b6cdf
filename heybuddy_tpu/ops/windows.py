"""
Sliding-window extraction for the featurization pipeline.

The reference handles long audio with three levels of host-side Python sliding
windows (embeddings.py:190-207 audio windows 17280/1920; embeddings.py:101,
136-146 spectrogram windows 76/8). Here the equivalent is a *static index
plan* computed once per input length, then a single vectorized gather on
device — no Python loops over windows, no recomputed spectrograms.

Key identity exploited: the audio-window stride (1920 samples) is exactly 12
spectrogram hops (160 samples), so the reference's per-window spectrograms are
overlapping views of ONE full-clip spectrogram. Computing the full spectrogram
once and gathering embedding windows at starts ``12*k + j`` (k = audio window,
j in {0, 8, 16, 24}) reproduces the reference's outputs (including its
duplicated overlap windows) with ~3x less spectrogram compute.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import (
    AUDIO_WINDOW_SIZE,
    AUDIO_WINDOW_STRIDE,
    EMBEDDING_WINDOW_SIZE,
    EMBEDDING_WINDOW_STRIDE,
    MEL_HOP_LENGTH,
)
from heybuddy_tpu.ops.melspec import num_frames

__all__ = ["embedding_window_starts", "extract_windows", "num_embedding_windows"]


@functools.lru_cache(maxsize=None)
def embedding_window_starts(
    num_samples: int,
    audio_window_size: int = AUDIO_WINDOW_SIZE,
    audio_window_stride: int = AUDIO_WINDOW_STRIDE,
    window_size: int = EMBEDDING_WINDOW_SIZE,
    window_stride: int = EMBEDDING_WINDOW_STRIDE,
) -> Tuple[int, ...]:
    """
    Frame indices (into the full-clip spectrogram) where each embedding window
    starts, in the exact order the reference emits them.

    For a 23040-sample clip this yields 16 starts:
    (0, 8, 16, 24, 12, 20, 28, 36, 24, 32, 40, 48, 36, 44, 52, 60).
    """
    assert audio_window_stride % MEL_HOP_LENGTH == 0, (
        "audio window stride must be a whole number of spectrogram hops "
        "for the single-spectrogram fast path"
    )
    hops_per_audio_stride = audio_window_stride // MEL_HOP_LENGTH
    frames_per_audio_window = num_frames(audio_window_size)
    starts: List[int] = []
    for k, _sample in enumerate(
        range(0, num_samples - audio_window_size + 1, audio_window_stride)
    ):
        for j in range(0, frames_per_audio_window - window_size + 1, window_stride):
            starts.append(k * hops_per_audio_stride + j)
    if not starts:
        raise ValueError(
            f"Audio too short for featurization: {num_samples} < {audio_window_size} samples"
        )
    total_frames = num_frames(num_samples)
    assert max(starts) + window_size <= total_frames
    return tuple(starts)


def num_embedding_windows(num_samples: int) -> int:
    """Number of (16->96) embedding rows produced for a clip of this length."""
    return len(embedding_window_starts(num_samples))


def extract_windows(
    spectrogram: jax.Array,
    starts: Tuple[int, ...],
    window_size: int = EMBEDDING_WINDOW_SIZE,
) -> jax.Array:
    """
    Gather embedding windows: (batch, frames, mel) -> (batch, n_windows, window_size, mel).

    ``starts`` is a static tuple, so the gather indices are a compile-time
    constant and XLA emits a single fused gather.
    """
    idx = np.asarray(starts, dtype=np.int32)[:, None] + np.arange(window_size, dtype=np.int32)
    return jnp.take(spectrogram, jnp.asarray(idx), axis=1)
