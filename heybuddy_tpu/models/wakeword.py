"""
Trainable wake-word classifiers (JAX).

Architecture parity with reference ``wakeword.py`` and ``modules/``:

* :class:`WakeWordMLPModel` — flatten(16x96) -> LayerNorm -> GatedMLP ->
  optional 16 "half-layer" striped-index branches -> N x [LN + GatedMLP] ->
  LN -> GatedMLP -> sigmoid (reference wakeword.py:171-347).
* :class:`WakeWordTransformerModel` — linear-in -> N pre-norm transformer
  blocks (QK-normed attention, softmax scale 1.0 as in the reference's
  ``scale_by_num_heads=False``, gated FFN with multiple_of=18) ->
  modulating final layer over the frame axis -> sigmoid -> amax over time
  (reference wakeword.py:350-461, modules/attention.py:14-132).

Models are pure pytrees + apply functions, so the training step jits cleanly
and ONNX export walks a plain parameter dict. ``from_torch_file`` imports the
reference's ``.pt`` checkpoints (torch CPU is available as a compatibility
dependency only — no torch in the compute path).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import (
    CLIP_SAMPLES,
    DEFAULT_ACTIVATION_THRESHOLD,
    DEFAULT_LAYER_DIM,
    DEFAULT_LAYERS,
    DEFAULT_HEADS,
    DEFAULT_USE_GATING,
    DEFAULT_USE_HALF_LAYERS,
    FEATURE_FRAMES,
    EMBEDDING_DIM,
    SAMPLE_RATE,
)

__all__ = [
    "get_normalized_dim",
    "WakeWordMLPModel",
    "WakeWordTransformerModel",
    "load_model",
    "HALF_LAYER_INDICES",
]

Params = Dict[str, Any]

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}

# Striped attention-style index masks for the optional half-connected layers
# (reference wakeword.py:279-302).
HALF_LAYER_INDICES: List[List[int]] = [
    [0, 1, 2, 3, 4, 5, 6, 7],
    [8, 9, 10, 11, 12, 13, 14, 15],
    [0, 1, 2, 3, 8, 9, 10, 11],
    [4, 5, 6, 7, 12, 13, 14, 15],
    [4, 5, 6, 7, 8, 9, 10, 11],
    [0, 1, 2, 3, 12, 13, 14, 15],
    [0, 1, 4, 5, 8, 9, 12, 13],
    [2, 3, 6, 7, 10, 11, 14, 15],
    [0, 1, 6, 7, 8, 9, 14, 15],
    [2, 3, 4, 5, 10, 11, 12, 13],
    [0, 2, 4, 6, 8, 10, 12, 14],
    [1, 3, 5, 7, 9, 11, 13, 15],
    [0, 3, 4, 7, 8, 11, 12, 15],
    [1, 2, 5, 6, 9, 10, 13, 14],
    [0, 5, 2, 7, 8, 13, 10, 15],
    [1, 4, 3, 6, 9, 12, 11, 14],
]


def find_nearest_multiple(n: int, multiple: int) -> int:
    if n % multiple == 0:
        return n
    return n + multiple - (n % multiple)


def get_normalized_dim(dim: int, multiple_of: int = 8, down_ratio: float = 2 / 3) -> int:
    """Hidden-dim convention from reference util/modeling_util.py:42-115."""
    return find_nearest_multiple(int(dim * down_ratio), multiple_of)


# --- primitive layers ----------------------------------------------------------


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jax.Array]:
    """Torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def _layernorm_init(dim: int, affine: bool = True) -> Dict[str, jax.Array]:
    if affine:
        return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    return {}


def _layernorm(p: Dict[str, jax.Array], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Always computed in float32 (reference FloatLayerNorm).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "g" in p:
        out = out * p["g"] + p["b"]
    return out.astype(x.dtype)


def _mlp_init(
    key: jax.Array,
    input_dim: int,
    hidden_dim: Optional[int],
    output_dim: Optional[int],
    gated: bool,
    multiple_of: int = 8,
) -> Dict[str, Any]:
    if hidden_dim is None:
        hidden_dim = input_dim * 4
    if output_dim is None:
        output_dim = input_dim
    hidden_dim = get_normalized_dim(hidden_dim, multiple_of)
    keys = jax.random.split(key, 3)
    params: Dict[str, Any] = {
        "hidden": _linear_init(keys[0], input_dim, hidden_dim),
        "output": _linear_init(keys[1], hidden_dim, output_dim),
    }
    if gated:
        params["gate"] = _linear_init(keys[2], input_dim, hidden_dim)
    return params


def _mlp_apply(p: Dict[str, Any], x: jax.Array, activation: str = "silu") -> jax.Array:
    act = ACTIVATIONS[activation]
    h = act(_linear(p["hidden"], x))
    if "gate" in p:
        h = h * _linear(p["gate"], x)
    return _linear(p["output"], h)


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array]) -> jax.Array:
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# --- inference mixin ------------------------------------------------------------


class WakeWordInferenceMixin:
    """Audio-level prediction helpers (reference wakeword.py:36-169)."""

    def _predict_scores(self, audio: Any, min_frames: int = CLIP_SAMPLES) -> np.ndarray:
        from heybuddy_tpu.models.featurizer import get_speech_embeddings
        from heybuddy_tpu.utils.audio_io import audio_to_bct_array

        audio_arr, _ = audio_to_bct_array(audio, sample_rate=SAMPLE_RATE)
        n, c, t = audio_arr.shape
        if t < min_frames:
            pad = min_frames - t
            left = pad // 2
            audio_arr = np.pad(audio_arr, ((0, 0), (0, 0), (left, pad - left)))
        embeddings = get_speech_embeddings()(audio_arr)  # (n, frames, 96)

        frames = embeddings.shape[1]
        if frames > FEATURE_FRAMES:
            # Longer clips: every 4 consecutive embeddings come from one
            # 1.08 s audio window (the featurizer emits 4 per window); a
            # 16-embedding context therefore corresponds to 4 consecutive
            # audio windows — exactly the training feature layout. Slide that
            # context in 4-embedding (one audio window / 0.12 s) steps and
            # take the max, matching the browser runtime's buffer.
            step = 4
            k = (frames - FEATURE_FRAMES) // step + 1
            windows = np.stack(
                [embeddings[:, i * step : i * step + FEATURE_FRAMES] for i in range(k)],
                axis=1,
            )  # (n, k, 16, 96)
            flat = windows.reshape(n * k, FEATURE_FRAMES, -1)
            # Pad the classifier batch to a power-of-two bucket: every
            # distinct audio duration otherwise produces a distinct n*k and a
            # fresh jit compile (40-500 s each on remote-compile backends).
            bucket = 1 << max(int(np.ceil(np.log2(max(flat.shape[0], 1)))), 0)
            if bucket > flat.shape[0]:
                flat = np.pad(flat, ((0, bucket - flat.shape[0]), (0, 0), (0, 0)))
            flat_scores = np.asarray(self(flat))[: n * k]
            return flat_scores.reshape(n, k).max(axis=1)

        scores = np.asarray(self(embeddings))  # type: ignore[operator]
        return scores.reshape(-1)

    def predict(
        self,
        audio: Any,
        threshold: float = DEFAULT_ACTIVATION_THRESHOLD,
        return_scores: bool = False,
        min_frames: int = CLIP_SAMPLES,
        **_compat: Any,
    ) -> Tuple[Any, ...]:
        scores = self._predict_scores(audio, min_frames=min_frames)
        if return_scores:
            return tuple(float(s) for s in scores)
        return tuple(bool(s > threshold) for s in scores)

    def predict_timecodes(
        self,
        audio: Any,
        threshold: float = DEFAULT_ACTIVATION_THRESHOLD,
        **_compat: Any,
    ) -> List[float]:
        """2 s windows, 1 s stride, de-duplicated adjacent hits (wakeword.py:50-114)."""
        from heybuddy_tpu.utils.audio_io import audio_to_bct_array

        audio_arr, _ = audio_to_bct_array(audio, sample_rate=SAMPLE_RATE)
        mono = audio_arr[0].mean(axis=0)
        t = mono.shape[0]
        remainder = t % SAMPLE_RATE
        if remainder > 0:
            mono = np.concatenate([mono, np.zeros(SAMPLE_RATE - remainder, dtype=np.float32)])
        silence = np.zeros(SAMPLE_RATE, dtype=np.float32)
        mono = np.concatenate([silence, mono, silence])
        windows = np.stack(
            [mono[i : i + 2 * SAMPLE_RATE] for i in range(0, mono.shape[0] - SAMPLE_RATE, SAMPLE_RATE)]
        )
        predictions = [bool(p) for p in self.predict(windows, threshold=threshold)]
        times: List[float] = []
        for i, hit in enumerate(predictions):
            if not hit:
                continue
            if i < len(predictions) - 1 and predictions[i + 1]:
                times.append(i + 0.5)
            elif i == len(predictions) - 1 and i > 0 and predictions[i - 1]:
                continue
            else:
                times.append(float(i))
        return times


# --- MLP model -------------------------------------------------------------------


class WakeWordMLPModel(WakeWordInferenceMixin):
    """Gated-MLP wake-word classifier: (batch, 16, 96) -> (batch, 1) probability."""

    architecture = "perceptron"

    def __init__(
        self,
        input_shape: Tuple[int, int] = (FEATURE_FRAMES, EMBEDDING_DIM),
        layer_dim: int = DEFAULT_LAYER_DIM,
        num_layers: int = DEFAULT_LAYERS,
        use_gating: bool = DEFAULT_USE_GATING,
        use_half_layers: bool = DEFAULT_USE_HALF_LAYERS,
        dropout: float = 0.1,
        activation: str = "silu",
        params: Optional[Params] = None,
        seed: int = 0,
    ) -> None:
        self.input_shape = tuple(input_shape)
        self.input_features = input_shape[0] * input_shape[1]
        self.layer_dim = layer_dim
        self.num_layers = num_layers
        self.use_gating = use_gating
        self.use_half_layers = use_half_layers
        self.dropout = dropout
        self.activation = activation
        self.params = params if params is not None else self.init_params(jax.random.PRNGKey(seed))
        self._jitted = None

    @property
    def half_indices(self) -> List[List[int]]:
        return HALF_LAYER_INDICES if self.use_half_layers else []

    def config(self) -> Dict[str, Any]:
        return {
            "architecture": self.architecture,
            "input_shape": list(self.input_shape),
            "layer_dim": self.layer_dim,
            "num_layers": self.num_layers,
            "use_gating": self.use_gating,
            "use_half_layers": self.use_half_layers,
            "dropout": self.dropout,
            "activation": self.activation,
        }

    def init_params(self, key: jax.Array) -> Params:
        n_half = len(self.half_indices)
        keys = jax.random.split(key, 3 + n_half + self.num_layers)
        params: Params = {
            "norm_in": _layernorm_init(self.input_features),
            "mlp_in": _mlp_init(keys[0], self.input_features, self.layer_dim, self.layer_dim, self.use_gating),
            "half_layers": [
                {
                    "norm": _layernorm_init(self.input_features // 2),
                    "mlp": _mlp_init(
                        keys[1 + i], self.input_features // 2, self.layer_dim, self.layer_dim, self.use_gating
                    ),
                }
                for i in range(n_half)
            ],
            "layers": [
                {
                    "norm": _layernorm_init(self.layer_dim),
                    "mlp": _mlp_init(keys[1 + n_half + i], self.layer_dim, self.layer_dim, self.layer_dim, self.use_gating),
                }
                for i in range(self.num_layers)
            ],
            "norm_out": _layernorm_init(self.layer_dim),
            "mlp_out": _mlp_init(keys[2 + n_half + self.num_layers], self.layer_dim, self.layer_dim, 1, self.use_gating),
        }
        return params

    def apply(
        self,
        params: Params,
        x: jax.Array,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = x.astype(jnp.float32)
        if train:
            x = _dropout(x, self.dropout, rng)
        b = x.shape[0]
        flat = x.reshape(b, -1)
        states = _mlp_apply(params["mlp_in"], _layernorm(params["norm_in"], flat), self.activation)

        for idx, half in zip(self.half_indices, params["half_layers"]):
            sub = x[:, jnp.asarray(idx), :].reshape(b, -1)
            states = states + _mlp_apply(half["mlp"], _layernorm(half["norm"], sub), self.activation)

        for layer in params["layers"]:
            states = _mlp_apply(layer["mlp"], _layernorm(layer["norm"], states), self.activation)

        states = _mlp_apply(params["mlp_out"], _layernorm(params["norm_out"], states), self.activation)
        return jax.nn.sigmoid(states)

    def __call__(self, x: Any) -> jax.Array:
        if self._jitted is None:
            self._jitted = jax.jit(lambda p, a: self.apply(p, a, train=False))
        return self._jitted(self.params, jnp.asarray(np.asarray(x, dtype=np.float32)))

    # --- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        save_model(self, path)

    @classmethod
    def from_file(cls, path: str, **kwargs: Any) -> "WakeWordMLPModel":
        model = load_model(path)
        assert isinstance(model, WakeWordMLPModel)
        return model

    @classmethod
    def from_torch_file(cls, path: str) -> "WakeWordMLPModel":
        """Import a reference ``.pt`` checkpoint (state-dict) for parity testing."""
        import torch

        state = torch.load(path, weights_only=True, map_location="cpu")
        layer_dim = state["norm_out.weight"].shape[0]
        num_layers = 0
        while f"layers.{num_layers}.0.weight" in state:
            num_layers += 1
        use_gating = "mlp_in.gate.weight" in state
        n_half = 0
        while f"half_layers.{n_half}.0.weight" in state:
            n_half += 1
        model = cls(
            layer_dim=layer_dim,
            num_layers=num_layers,
            use_gating=use_gating,
            use_half_layers=n_half > 0,
        )

        def t(name: str) -> jnp.ndarray:
            return jnp.asarray(state[name].numpy())

        def mlp(prefix: str) -> Dict[str, Any]:
            p = {
                "hidden": {"w": t(f"{prefix}.hidden.weight").T, "b": t(f"{prefix}.hidden.bias")},
                "output": {"w": t(f"{prefix}.output.weight").T, "b": t(f"{prefix}.output.bias")},
            }
            if f"{prefix}.gate.weight" in state:
                p["gate"] = {"w": t(f"{prefix}.gate.weight").T, "b": t(f"{prefix}.gate.bias")}
            return p

        params: Params = {
            "norm_in": {"g": t("norm_in.weight"), "b": t("norm_in.bias")},
            "mlp_in": mlp("mlp_in"),
            "half_layers": [
                {
                    "norm": {"g": t(f"half_layers.{i}.0.weight"), "b": t(f"half_layers.{i}.0.bias")},
                    "mlp": mlp(f"half_layers.{i}.1"),
                }
                for i in range(n_half)
            ],
            "layers": [
                {
                    "norm": {"g": t(f"layers.{i}.0.weight"), "b": t(f"layers.{i}.0.bias")},
                    "mlp": mlp(f"layers.{i}.1"),
                }
                for i in range(num_layers)
            ],
            "norm_out": {"g": t("norm_out.weight"), "b": t("norm_out.bias")},
            "mlp_out": mlp("mlp_out"),
        }
        model.params = params
        return model

    def save_onnx(self, path: str, opset_version: int = 19) -> None:
        from heybuddy_tpu.export.onnx_export import export_mlp_model

        export_mlp_model(self, path, opset_version=opset_version)


# --- Transformer model --------------------------------------------------------------


class WakeWordTransformerModel(WakeWordInferenceMixin):
    """Transformer wake-word classifier (reference wakeword.py:350-461)."""

    architecture = "transformer"

    def __init__(
        self,
        input_shape: Tuple[int, int] = (FEATURE_FRAMES, EMBEDDING_DIM),
        dim: int = DEFAULT_LAYER_DIM,
        num_layers: int = DEFAULT_LAYERS,
        num_heads: int = DEFAULT_HEADS,
        multiple_of: int = 18,
        norm_epsilon: float = 1e-5,
        dropout: float = 0.1,
        activation: str = "silu",
        params: Optional[Params] = None,
        seed: int = 0,
    ) -> None:
        self.input_shape = tuple(input_shape)
        self.input_frames, self.input_dim = input_shape
        self.dim = dim
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.multiple_of = multiple_of
        self.norm_epsilon = norm_epsilon
        self.dropout = dropout
        self.activation = activation
        self.params = params if params is not None else self.init_params(jax.random.PRNGKey(seed))
        self._jitted = None

    def config(self) -> Dict[str, Any]:
        return {
            "architecture": self.architecture,
            "input_shape": list(self.input_shape),
            "layer_dim": self.dim,
            "num_layers": self.num_layers,
            "num_heads": self.num_heads,
            "multiple_of": self.multiple_of,
            "norm_epsilon": self.norm_epsilon,
            "dropout": self.dropout,
            "activation": self.activation,
        }

    def init_params(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, 2 + 5 * self.num_layers)
        params: Params = {
            "linear_in": _linear_init(keys[0], self.input_dim, self.dim),
            "layernorm": _layernorm_init(self.dim),
            "blocks": [],
            "final": {
                # FinalLayer: affine-free norm + zero-init fc (modules/final.py:11-56).
                # No modulator: apply never modulates (the reference's
                # ModulatingFinalLayer also skips it for modulations=None), so
                # initializing one only bloated checkpoints with dead weights.
                "fc": {"w": jnp.zeros((self.input_frames, 1)), "b": jnp.zeros((1,))},
            },
        }
        for i in range(self.num_layers):
            k = keys[2 + 5 * i : 7 + 5 * i]
            inner = (self.dim // self.num_heads) * self.num_heads
            params["blocks"].append(
                {
                    "attention_norm": _layernorm_init(self.dim),
                    "attention": {
                        "queries": {"w": _linear_init(k[0], self.dim, inner)["w"]},
                        "keys": {"w": _linear_init(k[1], self.dim, inner)["w"]},
                        "values": {"w": _linear_init(k[2], self.dim, inner)["w"]},
                        "output": {"w": _linear_init(k[3], inner, self.dim)["w"]},
                        "query_norm": _layernorm_init(inner),
                        "key_norm": _layernorm_init(inner),
                    },
                    "feed_forward_norm": _layernorm_init(self.dim),
                    "feed_forward": _mlp_init(
                        k[4], self.dim, self.dim * 4, self.dim, gated=True, multiple_of=self.multiple_of
                    ),
                }
            )
        return params

    def _attention(self, p: Dict[str, Any], x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        head_dim = self.dim // self.num_heads
        q = jnp.dot(x, p["queries"]["w"], preferred_element_type=jnp.float32)
        k = jnp.dot(x, p["keys"]["w"], preferred_element_type=jnp.float32)
        v = jnp.dot(x, p["values"]["w"], preferred_element_type=jnp.float32)
        q = _layernorm(p["query_norm"], q)
        k = _layernorm(p["key_norm"], k)
        q = q.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        # Reference uses softmax scale 1.0 (scale_by_num_heads=False default).
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, -1)
        return jnp.dot(out, p["output"]["w"], preferred_element_type=jnp.float32)

    def apply(
        self,
        params: Params,
        x: jax.Array,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = x.astype(jnp.float32)
        if train:
            x = _dropout(x, self.dropout, rng)
        act = ACTIVATIONS[self.activation]
        x = act(_layernorm(params["layernorm"], _linear(params["linear_in"], x)))
        eps = self.norm_epsilon
        for block in params["blocks"]:
            x = x + self._attention(
                block["attention"], _layernorm(block["attention_norm"], x, eps=eps)
            )
            x = x + _mlp_apply(
                block["feed_forward"],
                _layernorm(block["feed_forward_norm"], x, eps=eps),
                self.activation,
            )
        # (b, frames, dim) -> (b, dim, frames); final layer normalizes over frames.
        x = jnp.swapaxes(x, 1, 2)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        logits = _linear(params["final"]["fc"], normed)[:, :, 0]  # (b, dim)
        probs = jax.nn.sigmoid(logits)
        return jnp.max(probs, axis=1, keepdims=True)

    def __call__(self, x: Any) -> jax.Array:
        if self._jitted is None:
            self._jitted = jax.jit(lambda p, a: self.apply(p, a, train=False))
        return self._jitted(self.params, jnp.asarray(np.asarray(x, dtype=np.float32)))

    def save(self, path: str) -> None:
        save_model(self, path)

    @classmethod
    def from_file(cls, path: str, **kwargs: Any) -> "WakeWordTransformerModel":
        model = load_model(path)
        assert isinstance(model, WakeWordTransformerModel)
        return model

    def save_onnx(self, path: str, opset_version: int = 19) -> None:
        raise NotImplementedError(
            "ONNX export currently supports the perceptron architecture; "
            "use architecture='perceptron' for browser deployment."
        )


# --- shared persistence -----------------------------------------------------------

ModelType = Union[WakeWordMLPModel, WakeWordTransformerModel]


def _flatten_params(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for key, value in params.items():
            flat.update(_flatten_params(value, f"{prefix}{key}/"))
    elif isinstance(params, (list, tuple)):
        for i, value in enumerate(params):
            flat.update(_flatten_params(value, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    root: Params = {}
    for key in sorted(flat.keys()):
        parts = key.split("/")
        node: Any = root
        for i, part in enumerate(parts[:-1]):
            idx: Any = int(part) if part.isdigit() else part
            nxt_is_list = parts[i + 1].isdigit()
            default: Any = [] if nxt_is_list else {}
            if isinstance(node, list):
                while len(node) <= idx:
                    node.append([] if nxt_is_list else {})
                node = node[idx]
            else:
                node = node.setdefault(idx, default)
        leaf: Any = int(parts[-1]) if parts[-1].isdigit() else parts[-1]
        value = jnp.asarray(flat[key])
        if isinstance(node, list):
            while len(node) <= leaf:
                node.append(None)
            node[leaf] = value
        else:
            node[leaf] = value
    return root


def save_model(model: ModelType, path: str) -> None:
    """Save params + architecture config in one npz."""
    flat = _flatten_params(model.params)
    flat["__config__"] = np.frombuffer(
        json.dumps(model.config()).encode("utf-8"), dtype=np.uint8
    )
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    np.savez(path, **flat)
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        os.replace(path + ".npz", path)


def load_model(path: str) -> ModelType:
    """Load a model (architecture inferred from the embedded config)."""
    loaded = np.load(path)
    config = json.loads(bytes(loaded["__config__"]).decode("utf-8"))
    flat = {k: loaded[k] for k in loaded.files if k != "__config__"}
    params = _unflatten_params(flat)
    arch = config.pop("architecture")
    if arch == "perceptron":
        # Empty lists don't survive npz flattening; restore them.
        params.setdefault("half_layers", [])
        params.setdefault("layers", [])
        return WakeWordMLPModel(
            input_shape=tuple(config["input_shape"]),
            layer_dim=config["layer_dim"],
            num_layers=config["num_layers"],
            use_gating=config["use_gating"],
            use_half_layers=config["use_half_layers"],
            dropout=config.get("dropout", 0.1),
            activation=config.get("activation", "silu"),
            params=params,
        )
    if arch == "transformer":
        return WakeWordTransformerModel(
            input_shape=tuple(config["input_shape"]),
            dim=config["layer_dim"],
            num_layers=config["num_layers"],
            num_heads=config.get("num_heads", DEFAULT_HEADS),
            multiple_of=config.get("multiple_of", 18),
            norm_epsilon=config.get("norm_epsilon", 1e-5),
            dropout=config.get("dropout", 0.1),
            activation=config.get("activation", "silu"),
            params=params,
        )
    raise ValueError(f"Unknown architecture in checkpoint: {arch}")
