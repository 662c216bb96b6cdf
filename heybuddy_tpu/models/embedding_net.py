"""
Frozen speech-embedding network: (76, 32) log-mel window -> 96-dim embedding.

Role parity with the reference's frozen Google speech-embedding ONNX model
(reference embeddings.py:23-54; browser mirror models/speech-embedding.ts).
The reference's weights are a hosted artifact this framework cannot assume
access to, so the network itself is re-designed TPU-first instead of being a
conv-graph translation:

* **All-matmul mixer**: the fixed 76x32 input is patchified along time
  (19 patches x (4*32) dims) and processed by token-mixing + channel-MLP
  blocks — every FLOP is a dense matmul on the MXU; no small-channel convs
  that would waste systolic-array occupancy.
* **Deterministic frozen init**: parameters derive from a fixed seed so
  cached feature shards remain consistent across hosts/sessions. Real
  deployments load trained weights via :func:`load_params` /
  :func:`save_params` (npz).

The embedding is *frozen* during wake-word training, exactly as in the
reference: it defines the feature space, the classifier trains on top.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import EMBEDDING_DIM, EMBEDDING_WINDOW_SIZE, MEL_BINS

__all__ = [
    "EmbeddingNetConfig",
    "init_params",
    "apply",
    "default_params",
    "save_params",
    "load_params",
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
        token_hidden_dim: int = 64,
        channel_hidden_dim: int = 384,
        num_blocks: int = 3,
        embedding_dim: int = EMBEDDING_DIM,
    ) -> None:
        assert window_size % patch_frames == 0
        self.window_size = window_size
        self.mel_bins = mel_bins
        self.patch_frames = patch_frames
        self.num_tokens = window_size // patch_frames
        self.patch_dim = patch_frames * mel_bins
        self.hidden_dim = hidden_dim
        self.token_hidden_dim = token_hidden_dim
        self.channel_hidden_dim = channel_hidden_dim
        self.num_blocks = num_blocks
        self.embedding_dim = embedding_dim

    def as_dict(self) -> Dict[str, int]:
        return {
            "window_size": self.window_size,
            "mel_bins": self.mel_bins,
            "patch_frames": self.patch_frames,
            "hidden_dim": self.hidden_dim,
            "token_hidden_dim": self.token_hidden_dim,
            "channel_hidden_dim": self.channel_hidden_dim,
            "num_blocks": self.num_blocks,
            "embedding_dim": self.embedding_dim,
        }


def _dense_init(key: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    fan_in = shape[0]
    scale = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_params(key: jax.Array, config: Optional[EmbeddingNetConfig] = None) -> Params:
    cfg = config or EmbeddingNetConfig()
    keys = jax.random.split(key, 2 + 4 * cfg.num_blocks)
    params: Params = {
        "patch_proj": {
            "w": _dense_init(keys[0], (cfg.patch_dim, cfg.hidden_dim)),
            "b": jnp.zeros((cfg.hidden_dim,)),
        },
        "blocks": [],
        "out_norm": {"g": jnp.ones((cfg.hidden_dim,)), "b": jnp.zeros((cfg.hidden_dim,))},
        "out_proj": {
            "w": _dense_init(keys[1], (cfg.hidden_dim, cfg.embedding_dim)),
            "b": jnp.zeros((cfg.embedding_dim,)),
        },
    }
    for i in range(cfg.num_blocks):
        k0, k1, k2, k3 = keys[2 + 4 * i : 6 + 4 * i]
        params["blocks"].append(
            {
                "token_norm": {"g": jnp.ones((cfg.hidden_dim,)), "b": jnp.zeros((cfg.hidden_dim,))},
                "token_up": {
                    "w": _dense_init(k0, (cfg.num_tokens, cfg.token_hidden_dim)),
                    "b": jnp.zeros((cfg.token_hidden_dim,)),
                },
                "token_down": {
                    "w": _dense_init(k1, (cfg.token_hidden_dim, cfg.num_tokens)),
                    "b": jnp.zeros((cfg.num_tokens,)),
                },
                "channel_norm": {"g": jnp.ones((cfg.hidden_dim,)), "b": jnp.zeros((cfg.hidden_dim,))},
                "channel_up": {
                    "w": _dense_init(k2, (cfg.hidden_dim, cfg.channel_hidden_dim)),
                    "b": jnp.zeros((cfg.channel_hidden_dim,)),
                },
                "channel_down": {
                    "w": _dense_init(k3, (cfg.channel_hidden_dim, cfg.hidden_dim)),
                    "b": jnp.zeros((cfg.hidden_dim,)),
                },
            }
        )
    return params


def _layernorm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    # Normalize in f32 regardless of compute dtype (mirrors the reference's
    # FloatLayerNorm, modules/mixed_precision.py:7).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * g + b
    return out.astype(x.dtype)


def _dense(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    return (
        jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32) + p["b"]
    ).astype(x.dtype)


def apply(
    params: Params,
    windows: jax.Array,
    config: Optional[EmbeddingNetConfig] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """
    Forward pass: (n, 76, 32) or (n, 76, 32, 1) windows -> (n, 96) embeddings.

    Matmuls run in ``compute_dtype`` (bfloat16 by default — MXU native) with
    float32 accumulation; layer norms are float32.
    """
    cfg = config or EmbeddingNetConfig()
    if windows.ndim == 4:
        windows = windows[..., 0]
    n = windows.shape[0]
    x = windows.reshape(n, cfg.num_tokens, cfg.patch_dim).astype(compute_dtype)
    x = _dense(x, params["patch_proj"])  # (n, tokens, hidden)

    for block in params["blocks"]:
        # Token mixing: matmul across the token axis.
        h = _layernorm(x, block["token_norm"]["g"], block["token_norm"]["b"])
        h = jnp.swapaxes(h, 1, 2)  # (n, hidden, tokens)
        h = jax.nn.gelu(_dense(h, block["token_up"]))
        h = _dense(h, block["token_down"])
        x = x + jnp.swapaxes(h, 1, 2)
        # Channel MLP.
        h = _layernorm(x, block["channel_norm"]["g"], block["channel_norm"]["b"])
        h = jax.nn.gelu(_dense(h, block["channel_up"]))
        h = _dense(h, block["channel_down"])
        x = x + h

    x = _layernorm(x, params["out_norm"]["g"], params["out_norm"]["b"])
    x = jnp.mean(x, axis=1)  # pool over tokens
    out = _dense(x, params["out_proj"])
    return out.astype(jnp.float32)


_DEFAULT_PARAMS_CACHE: Dict[int, Params] = {}
DEFAULT_SEED = 20260816


def default_params(seed: int = DEFAULT_SEED, config: Optional[EmbeddingNetConfig] = None) -> Params:
    """
    The frozen default parameters. If ``HEYBUDDY_EMBEDDING_WEIGHTS`` points at
    an npz file (a trained embedding), it is loaded; otherwise a deterministic
    fixed-seed initialization is used so cached features are reproducible.
    """
    env_path = os.environ.get("HEYBUDDY_EMBEDDING_WEIGHTS")
    if env_path and os.path.exists(env_path):
        return load_params(env_path)
    if seed not in _DEFAULT_PARAMS_CACHE:
        _DEFAULT_PARAMS_CACHE[seed] = init_params(jax.random.PRNGKey(seed), config)
    return _DEFAULT_PARAMS_CACHE[seed]


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
