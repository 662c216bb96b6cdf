"""
Frozen speech-embedding network: (76, 32) log-mel window -> 96-dim embedding.

Role parity with the reference's frozen Google speech-embedding ONNX model
(reference embeddings.py:23-54; browser mirror models/speech-embedding.ts).
The reference's weights are a hosted artifact this framework cannot assume
access to, so the network is re-designed TPU-first rather than translated:

* **Shared patch trunk + window pooling.** The classifier consumes 16
  *overlapping* windows per clip (stride 8 frames of a 76-frame window), so a
  per-window conv/mixer recomputes every patch ~9.5x. Instead, the full
  spectrogram is tiled once into non-overlapping 4-frame patches, each patch
  runs through a small MLP trunk exactly once, and every window gathers its 19
  patch features and reduces them with multi-head attention pooling. Window
  starts are always multiples of 4 frames (ops/windows.py), so a window's
  embedding depends only on its own 76 frames — identical semantics to a
  per-window network, at ~1/9 the compute and a fraction of the HBM traffic.
* **All-matmul, bfloat16 end to end** with f32 accumulation: patch projection,
  trunk MLPs, pooling scores, and the output head are dense matmuls on the
  MXU; there are no small-channel convs, transposes, or f32 norm round-trips
  in the hot path.
* **Deterministic frozen init**: parameters derive from a fixed seed so cached
  feature shards are reproducible across hosts. Trained weights load via
  :func:`load_params` / env ``HEYBUDDY_EMBEDDING_WEIGHTS``.

The embedding is *frozen* during wake-word training, exactly as in the
reference: it defines the feature space, the classifier trains on top.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import EMBEDDING_DIM, EMBEDDING_WINDOW_SIZE, MEL_BINS

__all__ = [
    "EmbeddingNetConfig",
    "init_params",
    "apply",
    "apply_spectrogram",
    "apply_spectrogram_banded",
    "default_params",
    "save_params",
    "load_params",
    "load_from_onnx",
    "OnnxEmbeddingNet",
    "embedding_space_id",
]

Params = Dict[str, Any]


class EmbeddingNetConfig:
    """Static architecture hyperparameters for the frozen embedding network."""

    def __init__(
        self,
        window_size: int = EMBEDDING_WINDOW_SIZE,
        mel_bins: int = MEL_BINS,
        patch_frames: int = 4,
        hidden_dim: int = 192,
        trunk_hidden_dim: int = 384,
        trunk_blocks: int = 2,
        pool_heads: int = 4,
        embedding_dim: int = EMBEDDING_DIM,
    ) -> None:
        assert window_size % patch_frames == 0
        self.window_size = window_size
        self.mel_bins = mel_bins
        self.patch_frames = patch_frames
        self.window_patches = window_size // patch_frames  # 19
        self.patch_dim = patch_frames * mel_bins  # 128
        self.hidden_dim = hidden_dim
        self.trunk_hidden_dim = trunk_hidden_dim
        self.trunk_blocks = trunk_blocks
        self.pool_heads = pool_heads
        self.embedding_dim = embedding_dim

    def as_dict(self) -> Dict[str, int]:
        return {
            "window_size": self.window_size,
            "mel_bins": self.mel_bins,
            "patch_frames": self.patch_frames,
            "hidden_dim": self.hidden_dim,
            "trunk_hidden_dim": self.trunk_hidden_dim,
            "trunk_blocks": self.trunk_blocks,
            "pool_heads": self.pool_heads,
            "embedding_dim": self.embedding_dim,
        }


def _dense_init(key: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    fan_in = shape[0]
    scale = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_params(key: jax.Array, config: Optional[EmbeddingNetConfig] = None) -> Params:
    cfg = config or EmbeddingNetConfig()
    keys = jax.random.split(key, 5 + 2 * cfg.trunk_blocks)
    params: Params = {
        "patch_proj": {
            "w": _dense_init(keys[0], (cfg.patch_dim, cfg.hidden_dim)),
            "b": jnp.zeros((cfg.hidden_dim,)),
        },
        "trunk": [
            {
                "up": {
                    "w": _dense_init(keys[1 + 2 * i], (cfg.hidden_dim, cfg.trunk_hidden_dim)),
                    "b": jnp.zeros((cfg.trunk_hidden_dim,)),
                },
                "down": {
                    "w": _dense_init(keys[2 + 2 * i], (cfg.trunk_hidden_dim, cfg.hidden_dim)),
                    "b": jnp.zeros((cfg.hidden_dim,)),
                },
            }
            for i in range(cfg.trunk_blocks)
        ],
        # learned positional code added per window position (19, hidden)
        "pos": 0.02
        * jax.random.normal(keys[1 + 2 * cfg.trunk_blocks], (cfg.window_patches, cfg.hidden_dim)),
        "pool_query": _dense_init(
            keys[2 + 2 * cfg.trunk_blocks], (cfg.hidden_dim, cfg.pool_heads)
        ),
        "head": {
            "w": _dense_init(
                keys[3 + 2 * cfg.trunk_blocks],
                (cfg.hidden_dim * cfg.pool_heads, cfg.embedding_dim),
            ),
            "b": jnp.zeros((cfg.embedding_dim,)),
        },
    }
    return params


def _dense(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    return (
        jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32) + p["b"]
    ).astype(x.dtype)


def _rms_scale(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """
    Centered RMS normalization (LayerNorm without affine). Centering matters:
    log-mel features share a large positive DC component (the ``log/10 + 2``
    scaling sits around ~2), and without mean subtraction that common mode
    dominates every normalized patch, collapsing the embedding's input
    dependence to a few percent.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    ms = jnp.mean(jnp.square(centered), axis=-1, keepdims=True)
    return (centered * jax.lax.rsqrt(ms + eps)).astype(x.dtype)


def _apply_trunk(params: Params, patches: jax.Array) -> jax.Array:
    """(..., patch_dim) -> (..., hidden) shared patch features."""
    x = _dense(_rms_scale(patches), params["patch_proj"])
    for block in params["trunk"]:
        h = jax.nn.gelu(_dense(_rms_scale(x), block["up"]), approximate=False)
        x = x + _dense(h, block["down"])
    return x


def _apply_pool(params: Params, feats: jax.Array) -> jax.Array:
    """(n, window_patches, hidden) -> (n, embedding_dim) attention pooling."""
    compute = feats.dtype
    x = feats + params["pos"].astype(compute)
    scores = jnp.dot(
        x, params["pool_query"].astype(compute), preferred_element_type=jnp.float32
    )  # (n, P, heads)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(compute)
    pooled = jnp.einsum("nph,npd->nhd", weights, x)  # (n, heads, hidden)
    pooled = pooled.reshape(pooled.shape[0], -1)
    out = _dense(_rms_scale(pooled), params["head"])
    return out.astype(jnp.float32)


def apply(
    params: Params,
    windows: jax.Array,
    config: Optional[EmbeddingNetConfig] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """
    Per-window forward: (n, 76, 32) or (n, 76, 32, 1) -> (n, 96).

    Equivalent to gathering from :func:`apply_spectrogram` when the window's
    frames align to the patch grid (they always do in the pipeline).
    """
    cfg = config or EmbeddingNetConfig()
    if windows.ndim == 4:
        windows = windows[..., 0]
    n = windows.shape[0]
    patches = windows.reshape(n, cfg.window_patches, cfg.patch_dim).astype(compute_dtype)
    feats = _apply_trunk(params, patches)
    return _apply_pool(params, feats)


def apply_spectrogram(
    params: Params,
    spectrogram: jax.Array,
    window_starts: Sequence[int],
    config: Optional[EmbeddingNetConfig] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """
    Whole-clip forward: (b, frames, mel) + static window starts -> (b, W, 96).

    The trunk runs ONCE over non-overlapping 4-frame patches of the full
    spectrogram; each window (start divisible by patch_frames) gathers its 19
    patch features and pools. This is the fused fast path used by the
    featurizer.
    """
    cfg = config or EmbeddingNetConfig()
    b, frames, mel = spectrogram.shape
    usable = (frames // cfg.patch_frames) * cfg.patch_frames
    patches = spectrogram[:, :usable].reshape(
        b, usable // cfg.patch_frames, cfg.patch_dim
    ).astype(compute_dtype)
    feats = _apply_trunk(params, patches)  # (b, P, hidden)

    starts = np.asarray(window_starts)
    assert (starts % cfg.patch_frames == 0).all(), "window starts must align to patch grid"
    idx = starts[:, None] // cfg.patch_frames + np.arange(cfg.window_patches)[None, :]
    gathered = jnp.take(feats, jnp.asarray(idx), axis=1)  # (b, W, 19, hidden)
    w = gathered.shape[1]
    pooled = _apply_pool(params, gathered.reshape(b * w, cfg.window_patches, -1))
    return pooled.reshape(b, w, -1)


@functools.lru_cache(maxsize=None)
def _band_constants(
    starts: Tuple[int, ...], patch_frames: int, window_patches: int, num_patches: int
) -> Tuple[np.ndarray, np.ndarray]:
    """
    Static banded-pooling structure for :func:`apply_spectrogram_banded`:
      selector: (W, P) 0/1 — patch p participates in window w
      k_index:  (W, P) int — p's position within w (0 where unused)
    """
    n_windows = len(starts)
    selector = np.zeros((n_windows, num_patches), dtype=np.float32)
    k_index = np.zeros((n_windows, num_patches), dtype=np.int32)
    for w, start in enumerate(starts):
        p0 = start // patch_frames
        for k in range(window_patches):
            selector[w, p0 + k] = 1.0
            k_index[w, p0 + k] = k
    return selector, k_index


def apply_spectrogram_banded(
    params: Params,
    spectrogram: jax.Array,
    window_starts: Sequence[int],
    config: Optional[EmbeddingNetConfig] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """
    Banded-matmul formulation of :func:`apply_spectrogram`: instead of
    gathering every window's 19 patch features (a (b, W, 19, D) materialization
    followed by tiny batched einsums — the round-1 profile's ~5 ms), the
    attention pooling is rewritten as TWO fat matmuls:

        pooled(w,h) = [sum_p Band_h(w,p)·e_a(p,h)·f(p)] / denom + pos-term

    where ``Band_h(w,p) = exp(pos_k·Q_h)`` on the window band and 0 elsewhere.
    ``softmax(x@Q) = e_a·e_c / denom`` because scores separate as
    ``(f+pos)@Q = a(p) + c(k)``. Identical math to ``_apply_pool`` up to float
    reassociation (weights are normalized then cast to the compute dtype, as
    in the gather path).
    """
    cfg = config or EmbeddingNetConfig()
    b, frames, mel = spectrogram.shape
    usable = (frames // cfg.patch_frames) * cfg.patch_frames
    num_patches = usable // cfg.patch_frames
    patches = spectrogram[:, :usable].reshape(b, num_patches, cfg.patch_dim).astype(compute_dtype)
    feats = _apply_trunk(params, patches)  # (b, P, D) compute dtype

    starts = tuple(int(s) for s in window_starts)
    assert all(s % cfg.patch_frames == 0 for s in starts)
    selector_np, k_index_np = _band_constants(
        starts, cfg.patch_frames, cfg.window_patches, num_patches
    )
    n_windows = len(starts)
    heads = cfg.pool_heads
    hidden = cfg.hidden_dim

    q = jnp.asarray(params["pool_query"], jnp.float32)
    c = jnp.dot(jnp.asarray(params["pos"], jnp.float32), q)  # (19, H)
    exp_c = jnp.exp(c - jnp.max(c))  # shift cancels in the ratio
    # band[w, h, p] = selector * exp_c[k(w,p), h]
    band = jnp.transpose(
        jnp.take(exp_c, jnp.asarray(k_index_np), axis=0), (0, 2, 1)
    ) * jnp.asarray(selector_np)[:, None, :]  # (W, H, P)

    # patch scores once for the whole clip
    a = jnp.dot(
        feats, q.astype(feats.dtype), preferred_element_type=jnp.float32
    )  # (b, P, H) f32
    a = a - jax.lax.stop_gradient(jnp.max(a, axis=1, keepdims=True))
    e_a = jnp.exp(a)  # (b, P, H)

    # unnormalized band weights (b, W, H, P); denominators by reduction over P
    bw = band[None] * jnp.transpose(e_a, (0, 2, 1))[:, None]  # (b, W, H, P) f32
    denom = jnp.sum(bw, axis=3, keepdims=True)  # (b, W, H, 1)
    weights = (bw / (denom + 1e-30)).astype(compute_dtype)

    # feature term: ONE batched matmul (b, W*H, P) @ (b, P, D)
    numer1 = jax.lax.dot_general(
        weights.reshape(b, n_windows * heads, num_patches),
        feats,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(b, n_windows, heads, hidden)

    # positional term: per-window per-k weights gathered from e_a, then one
    # (b*W*H, 19) @ (19, D) matmul
    idx = jnp.asarray(
        np.asarray(starts)[:, None] // cfg.patch_frames
        + np.arange(cfg.window_patches)[None, :]
    )  # (W, 19)
    ea_w = jnp.take(e_a, idx, axis=1)  # (b, W, 19, H)
    wk = ea_w * exp_c[None, None] / (jnp.transpose(denom, (0, 1, 3, 2)) + 1e-30)
    wk = jnp.transpose(wk, (0, 1, 3, 2)).astype(compute_dtype)  # (b, W, H, 19)
    numer2 = jnp.dot(
        wk.reshape(b * n_windows * heads, cfg.window_patches),
        params["pos"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(b, n_windows, heads, hidden)

    pooled = (numer1 + numer2).astype(compute_dtype).reshape(b * n_windows, heads * hidden)
    out = _dense(_rms_scale(pooled), params["head"])
    return out.astype(jnp.float32).reshape(b, n_windows, cfg.embedding_dim)


_DEFAULT_PARAMS_CACHE: Dict[int, Params] = {}
DEFAULT_SEED = 20260816


def bundled_weights_path() -> Optional[str]:
    """Path of the packaged pretrained embedding weights, if shipped."""
    path = os.path.join(os.path.dirname(__file__), "..", "assets", "embedding-pretrained.npz")
    path = os.path.abspath(path)
    return path if os.path.exists(path) else None


def default_params(seed: int = DEFAULT_SEED, config: Optional[EmbeddingNetConfig] = None) -> Params:
    """
    The frozen default parameters. Resolution order:
    1. ``HEYBUDDY_EMBEDDING_WEIGHTS`` env (a trained embedding npz);
    2. the packaged contrastively-pretrained weights
       (heybuddy_tpu/assets/embedding-pretrained.npz, see
       training/embedding_pretrain.py);
    3. deterministic fixed-seed initialization (reproducible cached features).
    """
    env_path = os.environ.get("HEYBUDDY_EMBEDDING_WEIGHTS")
    if env_path:
        if os.path.exists(env_path):
            cache_key: Any = ("env", os.path.abspath(env_path))
            if cache_key not in _DEFAULT_PARAMS_CACHE:
                _DEFAULT_PARAMS_CACHE[cache_key] = load_params(env_path)
            return _DEFAULT_PARAMS_CACHE[cache_key]
        from heybuddy_tpu.utils.log import logger

        logger.warning(
            f"HEYBUDDY_EMBEDDING_WEIGHTS={env_path!r} does not exist; falling "
            "back to the bundled/seed weights — a DIFFERENT feature space "
            "that invalidates caches produced with the intended weights."
        )
    bundled = bundled_weights_path()
    if bundled is not None:
        cache_key = ("bundled",)
        if cache_key not in _DEFAULT_PARAMS_CACHE:
            _DEFAULT_PARAMS_CACHE[cache_key] = load_params(bundled)
        return _DEFAULT_PARAMS_CACHE[cache_key]
    # Key by config too: a cache hit for the same seed must not hand a
    # non-default architecture the default architecture's weights.
    cache_key = ("seed", seed, config)
    if cache_key not in _DEFAULT_PARAMS_CACHE:
        _DEFAULT_PARAMS_CACHE[cache_key] = init_params(jax.random.PRNGKey(seed), config)
    return _DEFAULT_PARAMS_CACHE[cache_key]


class OnnxEmbeddingNet:
    """
    The reference's frozen speech-embedding model imported from its ONNX
    artifact (reference embeddings.py:23-54, hosted ``speech-embedding.onnx``
    at embeddings.py:29-30) as a jittable JAX function.

    ``apply(params, windows)`` takes (n, 76, 32) or (n, 76, 32, 1) log-mel
    windows and returns (n, 96) embeddings — the exact reference feature
    space, so hosted precalculated datasets match bit-for-bit (up to conv
    reassociation). Use whenever the artifact is available; the re-designed
    trunk+pool network remains the offline default.
    """

    def __init__(self, fn: Any, input_name: str, output_name: str, input_rank: int) -> None:
        self._fn = fn
        self.input_name = input_name
        self.output_name = output_name
        self.input_rank = input_rank
        self.params: Dict[str, np.ndarray] = fn.params

    @classmethod
    def from_file(cls, path: str) -> "OnnxEmbeddingNet":
        from heybuddy_tpu.export.onnx_to_jax import OnnxJaxFunction

        fn = OnnxJaxFunction.from_file(path)
        if len(fn.input_names) != 1:
            raise ValueError(
                f"Expected a single graph input, got {fn.input_names} — not a "
                "frozen embedding model"
            )
        # The browser runtime reads 'conv2d_19' (speech-embedding.ts:148-152);
        # fall back to the sole declared output.
        output = "conv2d_19" if "conv2d_19" in fn.output_names else fn.output_names[0]
        declared = {i.name: i.shape for i in fn.graph.inputs}
        rank = len(declared.get(fn.input_names[0], (0, 0, 0, 0)))
        return cls(fn, fn.input_names[0], output, rank)

    def apply(self, params: Dict[str, np.ndarray], windows: jax.Array) -> jax.Array:
        if windows.ndim == 3 and self.input_rank == 4:
            windows = windows[..., None]  # NHWC channel dim
        elif windows.ndim == 4 and self.input_rank == 3:
            windows = windows[..., 0]
        out = self._fn(params, windows)
        if isinstance(out, (list, tuple)):
            out = out[self._fn.output_names.index(self.output_name)]
        return out.reshape(out.shape[0], -1).astype(jnp.float32)  # (n,1,1,96)->(n,96)


def load_from_onnx(path: str) -> OnnxEmbeddingNet:
    """Import the frozen reference embedding model from ``speech-embedding.onnx``."""
    return OnnxEmbeddingNet.from_file(path)


def embedding_space_id(params: Any, backend: str = "trunkpool") -> str:
    """
    Short stable identifier of the feature space a parameter set produces:
    hash of the backend name + every weight buffer. Features cached under one
    space id must never be mixed with another's (see data/features.py sidecar
    and data/training.py hosted-negative guard).
    """
    import hashlib

    h = hashlib.sha256(backend.encode())
    for key, value in sorted(_flatten(params).items()):
        h.update(key.encode())
        h.update(np.ascontiguousarray(np.asarray(value, dtype=np.float32)).tobytes())
    return h.hexdigest()[:16]


def _flatten(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, list):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def save_params(params: Params, path: str) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Params:
    loaded = np.load(path)
    params: Params = {}
    for key in loaded.files:
        parts = key.split("/")
        node: Any = params
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if part.isdigit():
                part = int(part)  # type: ignore[assignment]
                while len(node) <= part:
                    node.append({})
            default: Any = [] if nxt.isdigit() else {}
            if isinstance(node, dict):
                node = node.setdefault(part, default)
            else:
                if not isinstance(node[part], (dict, list)) or node[part] == {}:
                    node[part] = default
                node = node[part]
        leaf = parts[-1]
        if leaf.isdigit():
            leaf = int(leaf)  # type: ignore[assignment]
        if isinstance(node, list):
            while len(node) <= leaf:
                node.append(None)
        node[leaf] = jnp.asarray(loaded[key])
    return params
