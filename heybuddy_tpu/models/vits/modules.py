"""
VITS building blocks in JAX (functional params + pure apply functions).

Architecture parity with reference ``piper/modules.py`` (LayerNorm, DDSConv,
WN, ResBlock2, Log, Flip, ElementwiseAffine, ResidualCouplingLayer, ConvFlow),
re-implemented as jittable functions over ``(batch, channels, time)`` arrays.
Weight-norm is folded at load time (inference keeps plain kernels).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@jax.tree_util.register_pytree_node_class
class Static:
    """
    Static (non-traced) metadata stored inside a parameter pytree. The value
    lives in the treedef aux data, so jit treats it as part of the function
    signature (different values -> recompilation) instead of a traced leaf.
    """

    def __init__(self, value: Any) -> None:
        self.value = value

    def tree_flatten(self) -> Tuple[tuple, Any]:
        return (), self.value

    @classmethod
    def tree_unflatten(cls, aux: Any, _children: tuple) -> "Static":
        return cls(aux)

    def __int__(self) -> int:
        return int(self.value)

    def __index__(self) -> int:
        return int(self.value)

    def __iter__(self):
        return iter(self.value)

    def __repr__(self) -> str:
        return f"Static({self.value!r})"


def static_value(x: Any) -> Any:
    return x.value if isinstance(x, Static) else x


# ---------------------------------------------------------------- conv helpers


def conv1d_init(
    key: jax.Array, in_ch: int, out_ch: int, kernel: int, zero: bool = False
) -> Params:
    if zero:
        w = jnp.zeros((out_ch, in_ch, kernel))
        b = jnp.zeros((out_ch,))
    else:
        bound = 1.0 / math.sqrt(in_ch * kernel)
        kw, kb = jax.random.split(key)
        w = jax.random.uniform(kw, (out_ch, in_ch, kernel), jnp.float32, -bound, bound)
        b = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv1d(
    p: Params,
    x: jax.Array,
    stride: int = 1,
    padding: Optional[int] = None,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Torch-semantics Conv1d over (b, c, t)."""
    kernel = p["w"].shape[-1]
    if padding is None:
        padding = 0
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return out + p["b"][None, :, None]


def conv_transpose1d(p: Params, x: jax.Array, stride: int, padding: int) -> jax.Array:
    """
    Torch-semantics ConvTranspose1d via input dilation:
    conv(dilate(x, stride), flip(W^T), pad = kernel-1-padding).
    Torch stores transposed-conv weights as (in, out, k); ``p["w"]`` here is
    already (out, in, k) with the kernel flipped (see weight import).
    """
    kernel = p["w"].shape[-1]
    pad = kernel - 1 - padding
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out + p["b"][None, :, None]


def conv_transpose1d_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int) -> Params:
    bound = 1.0 / math.sqrt(out_ch * kernel)  # torch fan-in for transposed conv
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (out_ch, in_ch, kernel), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound),
    }


def channel_layernorm_init(channels: int) -> Params:
    return {"g": jnp.ones((channels,)), "b": jnp.zeros((channels,))}


def channel_layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the channel axis of (b, c, t) (reference modules.py:19)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * p["g"][None, :, None] + p["b"][None, :, None]


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """(b,) lengths -> (b, max_length) 0/1 mask (reference common.py:42)."""
    positions = jnp.arange(max_length)[None, :]
    return (positions < lengths[:, None]).astype(jnp.float32)


def fused_add_tanh_sigmoid_multiply(a: jax.Array, b: jax.Array, n_channels: int) -> jax.Array:
    """Gated activation used by WN (reference common.py:118)."""
    total = a + b
    t_act = jnp.tanh(total[:, :n_channels])
    s_act = jax.nn.sigmoid(total[:, n_channels:])
    return t_act * s_act


# ------------------------------------------------------------------------ DDSConv


def ddsconv_init(
    key: jax.Array, channels: int, kernel_size: int, n_layers: int
) -> Params:
    keys = jax.random.split(key, 2 * n_layers)
    layers = []
    for i in range(n_layers):
        layers.append(
            {
                # depthwise: weight (channels, 1, k) with groups=channels
                "sep": conv1d_init(keys[2 * i], 1, channels, kernel_size),
                "pw": conv1d_init(keys[2 * i + 1], channels, channels, 1),
                "norm1": channel_layernorm_init(channels),
                "norm2": channel_layernorm_init(channels),
            }
        )
    return {"layers": layers, "kernel_size": Static(kernel_size)}


def ddsconv(p: Params, x: jax.Array, x_mask: jax.Array, g: Optional[jax.Array] = None) -> jax.Array:
    """Dilated depth-separable conv stack (reference modules.py DDSConv)."""
    kernel_size = int(p["kernel_size"])
    if g is not None:
        x = x + g
    for i, layer in enumerate(p["layers"]):
        dilation = kernel_size ** i
        padding = ((kernel_size - 1) * dilation) // 2
        y = conv1d(layer["sep"], x * x_mask, padding=padding, dilation=dilation,
                   groups=x.shape[1])
        y = channel_layernorm(layer["norm1"], y)
        y = jax.nn.gelu(y)
        y = conv1d(layer["pw"], y)
        y = channel_layernorm(layer["norm2"], y)
        y = jax.nn.gelu(y)
        x = x + y
    return x * x_mask


# ---------------------------------------------------------------------------- WN


def wn_init(
    key: jax.Array,
    hidden_channels: int,
    kernel_size: int,
    dilation_rate: int,
    n_layers: int,
    gin_channels: int = 0,
) -> Params:
    keys = jax.random.split(key, 2 * n_layers + 1)
    in_layers = []
    res_skip_layers = []
    for i in range(n_layers):
        dilation = dilation_rate ** i
        in_layers.append(conv1d_init(keys[2 * i], hidden_channels, 2 * hidden_channels, kernel_size))
        skip_ch = 2 * hidden_channels if i < n_layers - 1 else hidden_channels
        res_skip_layers.append(conv1d_init(keys[2 * i + 1], hidden_channels, skip_ch, 1))
    params: Params = {
        "in_layers": in_layers,
        "res_skip_layers": res_skip_layers,
        "kernel_size": Static(kernel_size),
        "dilation_rate": Static(dilation_rate),
    }
    if gin_channels > 0:
        params["cond_layer"] = conv1d_init(keys[-1], gin_channels, 2 * hidden_channels * n_layers, 1)
    return params


def wn(p: Params, x: jax.Array, x_mask: jax.Array, g: Optional[jax.Array] = None) -> jax.Array:
    """WaveNet-style gated residual stack (reference modules.py WN)."""
    hidden = x.shape[1]
    n_layers = len(p["in_layers"])
    kernel_size = int(p["kernel_size"])
    dilation_rate = int(p["dilation_rate"])
    output = jnp.zeros_like(x)

    g_all = conv1d(p["cond_layer"], g) if (g is not None and "cond_layer" in p) else None

    for i in range(n_layers):
        dilation = dilation_rate ** i
        padding = ((kernel_size - 1) * dilation) // 2
        x_in = conv1d(p["in_layers"][i], x, padding=padding, dilation=dilation)
        if g_all is not None:
            g_l = g_all[:, i * 2 * hidden : (i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, hidden)
        res_skip = conv1d(p["res_skip_layers"][i], acts)
        if i < n_layers - 1:
            x = (x + res_skip[:, :hidden]) * x_mask
            output = output + res_skip[:, hidden:]
        else:
            output = output + res_skip
    return output * x_mask


# -------------------------------------------------------------------- ResBlock2


def resblock2_init(
    key: jax.Array, channels: int, kernel_size: int, dilations: Sequence[int]
) -> Params:
    keys = jax.random.split(key, len(dilations))
    return {
        "convs": [conv1d_init(k, channels, channels, kernel_size) for k in keys],
        "kernel_size": Static(kernel_size),
        "dilations": Static(tuple(dilations)),
    }


def resblock2(p: Params, x: jax.Array) -> jax.Array:
    """HiFiGAN ResBlock2 (reference modules.py ResBlock2), leaky-relu 0.1."""
    kernel_size = int(p["kernel_size"])
    for conv, dilation in zip(p["convs"], static_value(p["dilations"])):
        padding = ((kernel_size - 1) * dilation) // 2
        y = jax.nn.leaky_relu(x, 0.1)
        y = conv1d(conv, y, padding=padding, dilation=dilation)
        x = x + y
    return x


# ----------------------------------------------------------------------- flows


def elementwise_affine_init(channels: int) -> Params:
    return {"m": jnp.zeros((channels, 1)), "logs": jnp.zeros((channels, 1))}


def elementwise_affine(
    p: Params, x: jax.Array, x_mask: jax.Array, reverse: bool = False
) -> Tuple[jax.Array, Optional[jax.Array]]:
    if not reverse:
        y = (p["m"][None] + jnp.exp(p["logs"][None]) * x) * x_mask
        logdet = jnp.sum(p["logs"][None] * x_mask, axis=(1, 2))
        return y, logdet
    return (x - p["m"][None]) * jnp.exp(-p["logs"][None]) * x_mask, None


def log_flow(x: jax.Array, x_mask: jax.Array, reverse: bool = False) -> Tuple[jax.Array, Optional[jax.Array]]:
    if not reverse:
        y = jnp.log(jnp.clip(x, 1e-5)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask, None


def flip_flow(x: jax.Array) -> jax.Array:
    return jnp.flip(x, axis=1)


def residual_coupling_layer_init(
    key: jax.Array,
    channels: int,
    hidden_channels: int,
    kernel_size: int,
    dilation_rate: int,
    n_layers: int,
    gin_channels: int = 0,
) -> Params:
    k_pre, k_wn, k_post = jax.random.split(key, 3)
    half = channels // 2
    return {
        "pre": conv1d_init(k_pre, half, hidden_channels, 1),
        "enc": wn_init(k_wn, hidden_channels, kernel_size, dilation_rate, n_layers, gin_channels),
        "post": conv1d_init(k_post, hidden_channels, half, 1, zero=True),
    }


def residual_coupling_layer(
    p: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: Optional[jax.Array] = None,
    reverse: bool = False,
) -> jax.Array:
    """Mean-only residual coupling (reference modules.py ResidualCouplingLayer)."""
    half = x.shape[1] // 2
    x0, x1 = x[:, :half], x[:, half:]
    h = conv1d(p["pre"], x0) * x_mask
    h = wn(p["enc"], h, x_mask, g=g)
    m = conv1d(p["post"], h) * x_mask
    if not reverse:
        x1 = (m + x1) * x_mask
    else:
        x1 = (x1 - m) * x_mask
    return jnp.concatenate([x0, x1], axis=1)


def convflow_init(
    key: jax.Array,
    in_channels: int,
    filter_channels: int,
    kernel_size: int,
    n_layers: int,
    num_bins: int = 10,
) -> Params:
    k_pre, k_conv, k_proj = jax.random.split(key, 3)
    half = in_channels // 2
    return {
        "pre": conv1d_init(k_pre, half, filter_channels, 1),
        "convs": ddsconv_init(k_conv, filter_channels, kernel_size, n_layers),
        "proj": conv1d_init(k_proj, filter_channels, half * (num_bins * 3 - 1), 1, zero=True),
        "num_bins": Static(num_bins),
    }


def convflow(
    p: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: Optional[jax.Array] = None,
    reverse: bool = False,
    tail_bound: float = 5.0,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Spline coupling flow (reference modules.py ConvFlow + transforms.py)."""
    from heybuddy_tpu.models.vits.transforms import rational_quadratic_spline

    num_bins = int(p["num_bins"])
    half = x.shape[1] // 2
    x0, x1 = x[:, :half], x[:, half:]
    h = conv1d(p["pre"], x0)
    h = ddsconv(p["convs"], h, x_mask, g=g)
    h = conv1d(p["proj"], h) * x_mask  # (b, half*(3*bins-1), t)

    b, _, t = x0.shape
    filter_channels = p["pre"]["w"].shape[0]
    h = h.reshape(b, half, 3 * num_bins - 1, t).transpose(0, 1, 3, 2)  # (b, half, t, 3*bins-1)
    denom = math.sqrt(filter_channels)
    unnormalized_widths = h[..., :num_bins] / denom
    unnormalized_heights = h[..., num_bins : 2 * num_bins] / denom
    unnormalized_derivatives = h[..., 2 * num_bins :]

    x1_new, logabsdet = rational_quadratic_spline(
        x1,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=reverse,
        tail_bound=tail_bound,
    )
    x_out = jnp.concatenate([x0, x1_new], axis=1) * x_mask
    logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
    if not reverse:
        return x_out, logdet
    return x_out, None
