"""
Relative-position multi-head attention + transformer encoder for the VITS
text encoder (architecture parity with reference ``piper/attentions.py``:
window_size=4 relative key/value embeddings, conv FFN with ReLU, post-norm).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from heybuddy_tpu.models.vits.modules import (
    Params,
    Static,
    channel_layernorm,
    channel_layernorm_init,
    conv1d,
    conv1d_init,
)

__all__ = ["encoder_init", "encoder"]


def _attention_init(
    key: jax.Array, channels: int, n_heads: int, window_size: int
) -> Params:
    k_q, k_k, k_v, k_o, k_rk, k_rv = jax.random.split(key, 6)
    head_dim = channels // n_heads
    rel_std = head_dim ** -0.5
    return {
        "conv_q": conv1d_init(k_q, channels, channels, 1),
        "conv_k": conv1d_init(k_k, channels, channels, 1),
        "conv_v": conv1d_init(k_v, channels, channels, 1),
        "conv_o": conv1d_init(k_o, channels, channels, 1),
        # Shared-across-heads relative embeddings (piper uses heads_share=True).
        "emb_rel_k": rel_std * jax.random.normal(k_rk, (1, 2 * window_size + 1, head_dim)),
        "emb_rel_v": rel_std * jax.random.normal(k_rv, (1, 2 * window_size + 1, head_dim)),
        "n_heads": Static(n_heads),
        "window_size": Static(window_size),
    }


def _relative_to_absolute(x: jax.Array) -> jax.Array:
    """
    (b, h, t, 2t-1) relative logits -> (b, h, t, t) absolute
    (reference attentions.py _relative_position_to_absolute_position).
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, t * 2 * t)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, t - 1)))
    return x_flat.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1 :]


def _absolute_to_relative(x: jax.Array) -> jax.Array:
    """(b, h, t, t) -> (b, h, t, 2t-1) (reference _absolute_position_to_relative_position)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x_flat = x.reshape(b, h, t * t + t * (t - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (t, 0)))
    return x_flat.reshape(b, h, t, 2 * t)[:, :, :, 1:]


def _get_relative_embeddings(emb: jax.Array, t: int, window_size: int) -> jax.Array:
    """Slice/pad the (1, 2w+1, d) table to (1, 2t-1, d)."""
    pad = max(t - (window_size + 1), 0)
    start = max((window_size + 1) - t, 0)
    padded = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return padded[:, start : start + 2 * t - 1]


def _attention(p: Params, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Self-attention over (b, c, t) with relative positions."""
    b, c, t = x.shape
    n_heads = int(p["n_heads"])
    head_dim = c // n_heads
    window_size = int(p["window_size"])

    q = conv1d(p["conv_q"], x).reshape(b, n_heads, head_dim, t).transpose(0, 1, 3, 2)
    k = conv1d(p["conv_k"], x).reshape(b, n_heads, head_dim, t).transpose(0, 1, 3, 2)
    v = conv1d(p["conv_v"], x).reshape(b, n_heads, head_dim, t).transpose(0, 1, 3, 2)

    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)

    rel_k = _get_relative_embeddings(p["emb_rel_k"], t, window_size)  # (1, 2t-1, d)
    rel_logits = jnp.einsum("bhqd,md->bhqm", q * scale, rel_k[0])
    scores = scores + _relative_to_absolute(rel_logits)

    scores = jnp.where(attn_mask > 0, scores, -1e4)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)

    rel_v = _get_relative_embeddings(p["emb_rel_v"], t, window_size)
    rel_weights = _absolute_to_relative(weights)
    out = out + jnp.einsum("bhqm,md->bhqd", rel_weights, rel_v[0])

    out = out.transpose(0, 1, 3, 2).reshape(b, c, t)
    return conv1d(p["conv_o"], out)


def _ffn_init(key: jax.Array, channels: int, filter_channels: int, kernel_size: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, channels, filter_channels, kernel_size),
        "conv2": conv1d_init(k2, filter_channels, channels, kernel_size),
        "kernel_size": Static(kernel_size),
    }


def _ffn(p: Params, x: jax.Array, x_mask: jax.Array) -> jax.Array:
    kernel_size = int(p["kernel_size"])
    padding = kernel_size // 2
    y = conv1d(p["conv1"], x * x_mask, padding=padding)
    y = jax.nn.relu(y)
    y = conv1d(p["conv2"], y * x_mask, padding=padding)
    return y * x_mask


def encoder_init(
    key: jax.Array,
    hidden_channels: int,
    filter_channels: int,
    n_heads: int,
    n_layers: int,
    kernel_size: int,
    window_size: int = 4,
) -> Params:
    keys = jax.random.split(key, 2 * n_layers)
    layers = []
    for i in range(n_layers):
        layers.append(
            {
                "attn": _attention_init(keys[2 * i], hidden_channels, n_heads, window_size),
                "norm1": channel_layernorm_init(hidden_channels),
                "ffn": _ffn_init(keys[2 * i + 1], hidden_channels, filter_channels, kernel_size),
                "norm2": channel_layernorm_init(hidden_channels),
            }
        )
    return {"layers": layers}


def encoder(p: Params, x: jax.Array, x_mask: jax.Array) -> jax.Array:
    """
    Post-norm transformer encoder over (b, c, t) (reference attentions.py:11-90).
    ``x_mask`` is (b, 1, t).
    """
    attn_mask = x_mask[:, :, :, None] * x_mask[:, :, None, :]  # (b, 1, t, t)
    x = x * x_mask
    for layer in p["layers"]:
        y = _attention(layer["attn"], x, attn_mask)
        x = channel_layernorm(layer["norm1"], x + y)
        y = _ffn(layer["ffn"], x, x_mask)
        x = channel_layernorm(layer["norm2"], x + y)
    return x * x_mask
