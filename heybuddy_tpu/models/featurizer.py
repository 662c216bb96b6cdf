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


def _resolve_pooling(pooling: str) -> str:
    """
    ``"auto"`` -> the fused Pallas pipeline on TPU (the fast path: whole
    mel+trunk+pool chain in VMEM, ~1.9x the XLA banded path on v5e), the XLA
    banded path elsewhere. ``HEYBUDDY_FUSED=0`` disables the Pallas path.
    """
    if pooling != "auto":
        return pooling
    import os

    if os.environ.get("HEYBUDDY_FUSED", "1") == "0":
        return "banded"
    return "fused" if jax.default_backend() == "tpu" else "banded"


def featurize_batch(
    params: Params,
    audio: jax.Array,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    config: Optional[EmbeddingNetConfig] = None,
    pooling: str = "auto",
) -> jax.Array:
    """
    Jittable core: (batch, t) float32 audio in int16-range values ->
    (batch, n_windows, 96) embeddings. For the canonical 1.44 s clip
    (t = 23040), n_windows = 16.

    ``pooling="auto"`` picks the fused Pallas kernels on TPU and the XLA
    banded path elsewhere (see ``_resolve_pooling``). ``"banded"`` runs the
    window pooling as two fat matmuls (embedding_net.apply_spectrogram_banded);
    ``"gather"`` keeps the original gather + batched-einsum formulation
    (identical math, slower on TPU); ``"fused"`` forces the production Pallas
    pipeline (ops/pallas/): mel + trunk + pool each stay in VMEM, eliminating
    the ~10 HBM-round-trip intermediates that bound the XLA paths on this
    device; ``"mega"`` runs the single audio->embedding kernel
    (ops/pallas/featurize_kernel.py) — numerically exact vs "fused" but
    measured SLOWER on v5e (9.1 vs 7.2 ms per 2048 clips): the spectrogram
    round-trip it eliminates was already hidden by Pallas grid pipelining,
    while its HIGHEST-precision redistribution matmuls are not free (PERF.md).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    b, t = audio.shape
    pooling = _resolve_pooling(pooling)
    if pooling in ("mega", "fused") and jnp.dtype(compute_dtype) != jnp.bfloat16:
        # The Pallas kernels hardcode bf16 matmuls; honoring a different
        # requested dtype matters more than the kernel speedup (otherwise
        # identical constructor args produce different numerics per platform).
        pooling = "banded"
    if pooling not in ("mega", "fused", "banded", "gather"):
        raise ValueError(
            f"unknown pooling {pooling!r}; expected auto/mega/fused/banded/gather"
        )
    starts = embedding_window_starts(t)
    if pooling == "mega":
        from heybuddy_tpu.ops.pallas.featurize_kernel import fused_featurize

        return fused_featurize(params, audio, starts, config=config)
    if pooling == "fused":
        from heybuddy_tpu.ops.pallas.embedding_kernel import fused_embedding_from_patches
        from heybuddy_tpu.ops.pallas.melspec_kernel import mel_patches_pallas

        # The mel kernel emits the embedding kernel's padded patch layout
        # directly: the spectrogram-layout handoff cost a measured 1.6 ms
        # slice+reshape+pad HBM copy per 2048-clip batch (PERF.md).
        patches, num_patches = mel_patches_pallas(audio)
        out = fused_embedding_from_patches(
            params, patches, starts, num_patches, config=config
        )
        return out[:b]
    spec = mel_spectrogram(audio)  # (b, F, 32) float32
    # Fused fast path: the embedding trunk runs once over the full
    # spectrogram's patch grid; windows gather trunk features and pool
    # (embedding_net.apply_spectrogram docstring).
    apply_fn = (
        embedding_net.apply_spectrogram_banded
        if pooling == "banded"
        else embedding_net.apply_spectrogram
    )
    return apply_fn(params, spec, starts, config=config, compute_dtype=compute_dtype)


def featurize_batch_per_window(
    apply_fn: Any,
    params: Any,
    audio: jax.Array,
) -> jax.Array:
    """
    Jittable per-window variant for imported frozen models whose graph runs
    one 76x32 window at a time (the reference's Google embedding ONNX,
    embeddings.py:86-151): mel spectrogram once, gather all windows with the
    static plan, then ONE batched forward over (b*W, 76, 32).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    b, t = audio.shape
    spec = mel_spectrogram(audio)  # (b, F, 32)
    starts = np.asarray(embedding_window_starts(t))
    from heybuddy_tpu.constants import EMBEDDING_WINDOW_SIZE

    idx = starts[:, None] + np.arange(EMBEDDING_WINDOW_SIZE)[None, :]
    windows = jnp.take(spec, jnp.asarray(idx), axis=1)  # (b, W, 76, 32)
    w = windows.shape[1]
    emb = apply_fn(params, windows.reshape(b * w, EMBEDDING_WINDOW_SIZE, -1))
    return emb.reshape(b, w, -1)


@functools.lru_cache(maxsize=1)
def _jitted_mel() -> Any:
    # Cached so return_spectrograms doesn't build a fresh PjitFunction (and
    # re-compile, 40-500 s on remote-compile backends) per call.
    return jax.jit(mel_spectrogram)


@functools.lru_cache(maxsize=8)
def _jitted_featurize(compute_dtype_name: str) -> Any:
    dtype = jnp.dtype(compute_dtype_name)
    return jax.jit(functools.partial(featurize_batch, compute_dtype=dtype))


# Stream featurization segment size (windows per compiled dispatch). One
# fixed shape: shorter segments zero-pad, so every stream length reuses the
# same compiled program (remote compiles cost 40-500 s on the axon tunnel).
STREAM_SEGMENT_WINDOWS = 1024


def _padded_rows(b: int, multiple: int) -> int:
    """
    Padded batch size bounding the number of distinct compiled shapes: small
    batches round up to the next power of two (1,2,4,...,multiple), larger
    ones to a multiple. Without this every odd `predict` batch size costs a
    fresh 40-500 s remote compile.
    """
    if b >= multiple:
        return b + ((-b) % multiple)
    size = 1
    while size < b:
        size *= 2
    return size


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
        onnx_path: Optional[str] = None,
        mesh: Optional[Any] = None,
    ) -> None:
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Padding the batch bounds the number of distinct compiled shapes when
        # callers stream variable batch sizes (see _padded_rows).
        self.pad_to_multiple = pad_to_multiple
        # Optional jax.sharding.Mesh: clip batches shard over the data axis
        # (params replicate) and jit compiles the same program SPMD across all
        # chips — the TPU-native scale-out for bulk featurization (extract).
        self.mesh = mesh
        self._onnx_net = None
        if onnx_path:
            # Imported reference frozen model: the exact reference feature
            # space (hosted precalculated sets match).
            net = embedding_net.load_from_onnx(onnx_path)
            self._onnx_net = net
            self.params = net.params
            self.backend = "onnx"
            self._fn = jax.jit(
                functools.partial(featurize_batch_per_window, net.apply)
            )
        else:
            self.params = params if params is not None else embedding_net.default_params()
            self.backend = "trunkpool"
            self._fn = _jitted_featurize(self.compute_dtype.name)
        self._space_id: Optional[str] = None
        self._stream_fn: Optional[Any] = None
        self._stream_fn_stride: Optional[int] = None
        if self.mesh is not None:
            from heybuddy_tpu.parallel.mesh import replicated

            self.params = jax.device_put(self.params, replicated(self.mesh))

    @property
    def space_id(self) -> str:
        """Stable identifier of the feature space (backend + weights hash)."""
        if self._space_id is None:
            self._space_id = embedding_net.embedding_space_id(self.params, self.backend)
        return self._space_id

    def _pad_batch(self, mono: np.ndarray) -> np.ndarray:
        b = mono.shape[0]
        target = _padded_rows(b, self.pad_to_multiple)
        if self.mesh is not None:
            # batch must divide across the mesh's data axis
            n_data = self.mesh.shape["data"]
            target = max(target, n_data) + ((-max(target, n_data)) % n_data)
        pad_b = target - b
        if pad_b:
            mono = np.concatenate(
                [mono, np.zeros((pad_b,) + mono.shape[1:], dtype=np.float32)], axis=0
            )
        return mono

    def _put(self, mono: np.ndarray) -> jax.Array:
        """Host batch -> device(s): sharded over the mesh's data axis if set."""
        if self.mesh is not None:
            from heybuddy_tpu.parallel.mesh import shard_batch

            return shard_batch(mono, self.mesh)
        return jnp.asarray(mono)

    def featurize_stream_device(
        self, stream: np.ndarray, count: int, stride: int
    ) -> Tuple[jax.Array, int]:
        """
        Featurize ``count`` sliding windows (CLIP_SAMPLES wide, ``stride``
        apart) of a continuous float32 stream in [-1, 1], with the windows
        gathered ON DEVICE: the host uploads the raw stream segment once
        (~8 MB) instead of every overlapping window — at the runtime's 1920
        stride that is 12x fewer bytes over the host->device link, which is
        the bottleneck for stream featurization (PERF.md: ~15 MB/s sustained
        on the axon tunnel). One compiled shape: segments zero-pad to
        STREAM_SEGMENT_WINDOWS windows and rows past ``count`` are padding.
        Returns the device array and the real row count.
        """
        from heybuddy_tpu.constants import CLIP_SAMPLES

        seg_windows = STREAM_SEGMENT_WINDOWS
        count = min(count, seg_windows)
        seg_len = (seg_windows - 1) * stride + CLIP_SAMPLES
        if self._stream_fn is None or self._stream_fn_stride != stride:
            raw_fn = self._fn  # jitted; nesting under jit just inlines the trace

            def stream_featurize(params: Params, seg: jax.Array) -> jax.Array:
                starts = jnp.arange(seg_windows, dtype=jnp.int32) * stride
                windows = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(seg, (s,), (CLIP_SAMPLES,))
                )(starts)
                return raw_fn(params, windows * 32767.0)

            self._stream_fn = jax.jit(stream_featurize)
            self._stream_fn_stride = stride
        seg = np.zeros(seg_len, dtype=np.float32)
        take = min(len(stream), seg_len)
        seg[:take] = stream[:take]
        return self._stream_fn(self.params, jnp.asarray(seg)), count

    def featurize_device(self, audio_batch: np.ndarray) -> Tuple[jax.Array, int]:
        """
        Asynchronously dispatch featurization of a prepared (b, t) float32
        batch in [-1, 1]; returns the (padded) device array and the real row
        count. Used for double-buffered ingestion: the caller materializes the
        previous batch's result while this one computes.
        """
        mono = self._pad_batch(audio_batch.astype(np.float32) * 32767.0)
        b = audio_batch.shape[0]
        return self._fn(self.params, self._put(mono)), b

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
        mono = self._pad_batch(mono)
        embeddings = np.asarray(self._fn(self.params, self._put(mono)))[:b]

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

            spec = np.asarray(_jitted_mel()(jnp.asarray(mono)))[:b]
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
    """
    Get the shared featurizer instance (reference embeddings.py:237-243).
    Set ``HEYBUDDY_EMBEDDING_ONNX`` to the reference's ``speech-embedding.onnx``
    to featurize in the exact reference feature space.
    """
    global _GLOBAL_EMBEDDINGS
    if _GLOBAL_EMBEDDINGS is None:
        import os

        onnx_path = kwargs.pop("onnx_path", None) or os.environ.get("HEYBUDDY_EMBEDDING_ONNX")
        if onnx_path:
            if os.path.exists(onnx_path):
                kwargs["onnx_path"] = onnx_path
            else:
                logger.warning(
                    f"HEYBUDDY_EMBEDDING_ONNX/onnx_path {onnx_path!r} does not "
                    "exist; falling back to the trunkpool embedding — features "
                    "will NOT be in the reference feature space."
                )
        _GLOBAL_EMBEDDINGS = SpeechEmbeddings(**kwargs)
    elif kwargs:
        logger.warning(
            f"get_speech_embeddings ignoring {sorted(kwargs)}: the shared "
            "featurizer was already constructed with different settings."
        )
    return _GLOBAL_EMBEDDINGS
