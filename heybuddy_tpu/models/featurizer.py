"""
The featurization pipeline: raw audio clips -> (n, 16, 96) classifier features.

This is the framework's flagship hot path and the benchmark metric
("clips featurized+embedded / sec / chip"). Functional parity with the
reference's ``SpeechEmbeddings.__call__`` (embeddings.py:153-235), which runs
three levels of host-side Python window loops around two ONNX sessions. Here
the whole thing is ONE jitted function per input length:

    frames -> windowed-DFT matmul -> mel matmul -> window gather -> embedding net

All stages live in HBM; XLA fuses the elementwise work into the matmuls. The
reference's per-window Python batching (embeddings.py:136-146, its biggest
featurization bottleneck) is replaced by a static gather plan (ops/windows.py)
and one batched embedding forward.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import SAMPLE_RATE
from heybuddy_tpu.models import embedding_net
from heybuddy_tpu.models.embedding_net import EmbeddingNetConfig, Params
from heybuddy_tpu.ops.melspec import mel_spectrogram
from heybuddy_tpu.ops.windows import embedding_window_starts
from heybuddy_tpu.utils.audio_io import audio_to_bct_array
from heybuddy_tpu.utils.log import logger

__all__ = ["featurize_batch", "SpeechEmbeddings", "get_speech_embeddings"]


def featurize_batch(
    params: Params,
    audio: jax.Array,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    config: Optional[EmbeddingNetConfig] = None,
) -> jax.Array:
    """
    Jittable core: (batch, t) float32 audio in int16-range values ->
    (batch, n_windows, 96) embeddings. For the canonical 1.44 s clip
    (t = 23040), n_windows = 16.
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    b, t = audio.shape
    spec = mel_spectrogram(audio)  # (b, F, 32) float32
    starts = embedding_window_starts(t)
    # Fused fast path: the embedding trunk runs once over the full
    # spectrogram's patch grid; windows gather trunk features and pool
    # (embedding_net.apply_spectrogram docstring).
    return embedding_net.apply_spectrogram(
        params, spec, starts, config=config, compute_dtype=compute_dtype
    )


@functools.lru_cache(maxsize=8)
def _jitted_featurize(compute_dtype_name: str) -> Any:
    dtype = jnp.dtype(compute_dtype_name)
    return jax.jit(functools.partial(featurize_batch, compute_dtype=dtype))


class SpeechEmbeddings:
    """
    User-facing featurizer with the reference's calling convention
    (embeddings.py:153): accepts paths / arrays / lists, resamples to 16 kHz,
    scales to int16-range values, downmixes to mono, and returns float32
    numpy embeddings (batch, n, 96). Optionally also the (scaled-log) mel
    spectrograms truncated to whole embedding windows, like the reference's
    ``return_spectrograms``.
    """

    def __init__(
        self,
        params: Optional[Params] = None,
        compute_dtype: jnp.dtype = jnp.bfloat16,
        pad_to_multiple: int = 64,
    ) -> None:
        self.params = params if params is not None else embedding_net.default_params()
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Padding the batch to a multiple bounds the number of distinct
        # compiled shapes when callers stream variable batch sizes.
        self.pad_to_multiple = pad_to_multiple

    def featurize_device(self, audio_batch: np.ndarray) -> Tuple[jax.Array, int]:
        """
        Asynchronously dispatch featurization of a prepared (b, t) float32
        batch in [-1, 1]; returns the (padded) device array and the real row
        count. Used for double-buffered ingestion: the caller materializes the
        previous batch's result while this one computes.
        """
        mono = audio_batch.astype(np.float32) * 32767.0
        b, t = mono.shape
        pad_b = (-b) % self.pad_to_multiple if b > self.pad_to_multiple else 0
        if pad_b:
            mono = np.concatenate([mono, np.zeros((pad_b, t), dtype=np.float32)], axis=0)
        fn = _jitted_featurize(self.compute_dtype.name)
        return fn(self.params, jnp.asarray(mono)), b

    def __call__(
        self,
        audio: Any,
        remove_nan: bool = True,
        return_spectrograms: bool = False,
        **_compat_kwargs: Any,
    ) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
        batch, _sr = audio_to_bct_array(audio, sample_rate=SAMPLE_RATE)
        mono = batch.mean(axis=1) * 32767.0  # (b, t), int16-range like the reference
        b, t = mono.shape

        pad_b = (-b) % self.pad_to_multiple if b > self.pad_to_multiple else 0
        if pad_b:
            mono = np.concatenate([mono, np.zeros((pad_b, t), dtype=np.float32)], axis=0)

        fn = _jitted_featurize(self.compute_dtype.name)
        embeddings = np.asarray(fn(self.params, jnp.asarray(mono)))[:b]

        if remove_nan:
            embeddings = self._repair_nan(embeddings)

        if return_spectrograms:
            # Reference semantics (embeddings.py:229-232): per-audio-window
            # spectrograms are concatenated along the frame axis, then the
            # concatenated array is truncated to whole embedding windows
            # (17280 samples -> 105 frames -> 100; 23040 -> 4x105 = 420 -> 420).
            from heybuddy_tpu.constants import (
                AUDIO_WINDOW_SIZE,
                AUDIO_WINDOW_STRIDE,
                EMBEDDING_WINDOW_SIZE,
                EMBEDDING_WINDOW_STRIDE,
                MEL_HOP_LENGTH,
            )
            from heybuddy_tpu.ops.melspec import num_frames

            spec = np.asarray(jax.jit(mel_spectrogram)(jnp.asarray(mono)))[:b]
            frames_per = num_frames(AUDIO_WINDOW_SIZE)
            hops = AUDIO_WINDOW_STRIDE // MEL_HOP_LENGTH
            per_window = [
                spec[:, k * hops : k * hops + frames_per]
                for k, _ in enumerate(range(0, t - AUDIO_WINDOW_SIZE + 1, AUDIO_WINDOW_STRIDE))
            ]
            concat = np.concatenate(per_window, axis=1)
            total = concat.shape[1]
            truncated = total - ((total - EMBEDDING_WINDOW_SIZE) % EMBEDDING_WINDOW_STRIDE)
            return embeddings, concat[:, :truncated]

        return embeddings

    @staticmethod
    def _repair_nan(embeddings: np.ndarray) -> np.ndarray:
        """Replace NaN rows with random good rows (reference embeddings.py:213-227)."""
        nan_rows = np.isnan(embeddings).any(axis=(1, 2))
        if not nan_rows.any():
            return embeddings
        keep = np.where(~nan_rows)[0]
        bad = np.where(nan_rows)[0]
        logger.warning(f"Replacing {len(bad)} NaN embeddings with random embeddings.")
        if keep.size == 0:
            logger.warning("All embeddings are NaN, returning zero embeddings.")
            return np.zeros_like(embeddings)
        embeddings = embeddings.copy()
        embeddings[bad] = embeddings[np.random.choice(keep, size=len(bad))]
        return embeddings


_GLOBAL_EMBEDDINGS: Optional[SpeechEmbeddings] = None


def get_speech_embeddings(**kwargs: Any) -> SpeechEmbeddings:
    """Get the shared featurizer instance (reference embeddings.py:237-243)."""
    global _GLOBAL_EMBEDDINGS
    if _GLOBAL_EMBEDDINGS is None:
        _GLOBAL_EMBEDDINGS = SpeechEmbeddings(**kwargs)
    return _GLOBAL_EMBEDDINGS
