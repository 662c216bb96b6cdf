"""
Fused Pallas kernel for the frozen embedding network (trunk + window pooling).

The XLA path (models/embedding_net.apply_spectrogram) runs ~40 separate ops
per batch: patch norm/projection, two residual MLP blocks, the per-window
gather of trunk features, attention-pooling softmax/einsums, and the output
head. This kernel fuses all of it per clip tile, with the big per-window
gather replaced by a **banded matmul** identity:

    score(w, k, h)   = f[p] @ Q_h + pos_k @ Q_h          (p = start_w + k)
    e(w, k, h)       = exp(a[p, h]) * exp(c[k, h])
    pooled(w, h, :)  = [ sum_k e * f[p] + sum_k e * pos_k ] / sum_k e

The first (heavy) term is ``Band_h @ (exp(a)[:, h] * feats)`` where
``Band_h[w, p] = exp(c[p - start_w, h])`` on the window band and 0 elsewhere —
a dense (W, P) x (P, D) matmul per head instead of materializing a
(W, 19, D) gather. The remaining terms only involve the tiny (P, heads)
score matrix. Numerically identical to the XLA path (f32).

STATUS: validated in interpreter mode (exact vs apply_spectrogram); the
Mosaic TC lowering currently rejects one of the in-kernel 3D contractions
("unsupported shape cast") — tracked as a round-2 item; the XLA path remains
the production featurizer.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.models.embedding_net import EmbeddingNetConfig

__all__ = ["fused_embedding_windows"]


@functools.lru_cache(maxsize=None)
def _band_structure(
    window_starts: Tuple[int, ...], patch_frames: int, window_patches: int, num_patches: int
) -> Tuple[np.ndarray, np.ndarray]:
    """
    Returns (selector, k_index):
      selector: (W, P) 0/1 — patch p participates in window w
      k_index:  (W, P) int — position of p within w (0 where unused)
    """
    n_windows = len(window_starts)
    selector = np.zeros((n_windows, num_patches), dtype=np.float32)
    k_index = np.zeros((n_windows, num_patches), dtype=np.int32)
    for w, start in enumerate(window_starts):
        p0 = start // patch_frames
        for k in range(window_patches):
            selector[w, p0 + k] = 1.0
            k_index[w, p0 + k] = k
    return selector, k_index


def fused_embedding_windows(
    params: Dict[str, Any],
    spectrogram: jax.Array,
    window_starts: Sequence[int],
    config: EmbeddingNetConfig = None,
    clip_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """
    (b, frames, mel) spectrogram + static window starts -> (b, W, 96)
    embeddings, one fused kernel per clip tile. Equivalent to
    ``embedding_net.apply_spectrogram`` in float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = config or EmbeddingNetConfig()
    b, frames, mel = spectrogram.shape
    usable = (frames // cfg.patch_frames) * cfg.patch_frames
    num_patches = usable // cfg.patch_frames
    # Pad the patch axis to a sublane multiple (Mosaic-friendly reshapes);
    # band/selector matrices are zero over the padding, so results are exact.
    num_patches_padded = ((num_patches + 7) // 8) * 8
    n_windows = len(window_starts)
    hidden = cfg.hidden_dim
    heads = cfg.pool_heads

    starts = tuple(int(s) for s in window_starts)
    selector_np, k_index_np = _band_structure(
        starts, cfg.patch_frames, cfg.window_patches, num_patches_padded
    )

    # Weights (all small; loaded whole into VMEM).
    w_patch = np.asarray(params["patch_proj"]["w"], np.float32)
    b_patch = np.asarray(params["patch_proj"]["b"], np.float32)
    trunk = [
        (
            np.asarray(blk["up"]["w"], np.float32),
            np.asarray(blk["up"]["b"], np.float32),
            np.asarray(blk["down"]["w"], np.float32),
            np.asarray(blk["down"]["b"], np.float32),
        )
        for blk in params["trunk"]
    ]
    pos = np.asarray(params["pos"], np.float32)            # (19, hidden)
    pool_q = np.asarray(params["pool_query"], np.float32)  # (hidden, heads)
    w_head = np.asarray(params["head"]["w"], np.float32)   # (hidden*heads, 96)
    b_head = np.asarray(params["head"]["b"], np.float32)

    # Precomputed pooling constants.
    c = pos @ pool_q                                        # (19, heads) pos score offsets
    exp_c = np.exp(c)                                       # (19, heads)
    # Band matrices per head: Band[h, w, p] = exp_c[k(w,p), h] on the band.
    band = np.zeros((heads, n_windows, num_patches_padded), np.float32)
    for h in range(heads):
        band[h] = selector_np * exp_c[k_index_np[np.arange(n_windows)[:, None],
                                                 np.arange(num_patches_padded)[None, :]], h]
    # Positional-value contribution: pv[h, w, p] = exp_c[k, h] * 1{band} paired
    # with pos rows; numer2 = sum_p Band*E * pos_k -> use small gathered form:
    # posmat[h, k, :] = exp_c[k, h] * pos[k, :]
    posmat = np.einsum("kh,kd->hkd", exp_c, pos).astype(np.float32)  # (heads, 19, hidden)
    # Window-k selection for the small matrices: sel_k[w, p] one-hot per k is
    # implicit via k_index; build (heads, 19, W, P) would be large — instead
    # numer2[w,h,:] = sum_k posmat[h,k,:] * (sum_p 1{k(w,p)=k} * E[p,h]).
    # Represent with per-k selectors stacked as (19, W, P) 0/1:
    sel_k = np.zeros((cfg.window_patches, n_windows, num_patches_padded), np.float32)
    for w in range(n_windows):
        for p in range(num_patches_padded):
            if selector_np[w, p]:
                sel_k[k_index_np[w, p], w, p] = 1.0

    pad_b = (-b) % clip_tile
    if pad_b:
        spectrogram = jnp.concatenate(
            [spectrogram, jnp.zeros((pad_b, frames, mel), spectrogram.dtype)], axis=0
        )
    total_b = spectrogram.shape[0]
    patches_in = spectrogram[:, :usable].reshape(total_b, num_patches, cfg.patch_dim)
    if num_patches_padded != num_patches:
        patches_in = jnp.concatenate(
            [patches_in, jnp.zeros((total_b, num_patches_padded - num_patches, cfg.patch_dim),
                                   patches_in.dtype)], axis=1)

    grid = (total_b // clip_tile,)

    n_blocks = len(trunk)
    up_w = np.stack([blk[0] for blk in trunk])   # (B, hidden, trunk_hidden)
    up_b = np.stack([blk[1] for blk in trunk])
    dn_w = np.stack([blk[2] for blk in trunk])
    dn_b = np.stack([blk[3] for blk in trunk])
    # biases as (1, d) rows for clean SMEM/VMEM layout
    b_patch_row = b_patch[None, :]
    b_head_row = b_head[None, :]

    def _erf(x):
        # Abramowitz & Stegun 7.1.26 rational approximation (|err| < 1.5e-7):
        # Mosaic has no erf/erfc primitive; exact-gelu parity to f32 precision.
        sign = jnp.sign(x)
        ax = jnp.abs(x)
        tt = 1.0 / (1.0 + 0.3275911 * ax)
        poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (1.421413741
               + tt * (-1.453152027 + tt * 1.061405429))))
        return sign * (1.0 - poly * jnp.exp(-ax * ax))

    def kernel(patches_ref, band_ref, selk_ref, posmat_ref, poolq_ref, whead_ref,
               wpatch_ref, bpatch_ref, upw_ref, upb_ref, dnw_ref, dnb_ref, bhead_ref,
               out_ref):
        x = patches_ref[...].reshape(clip_tile * num_patches_padded, cfg.patch_dim)

        def rms(v):
            mean = jnp.mean(v, axis=-1, keepdims=True)
            centered = v - mean
            ms = jnp.mean(centered * centered, axis=-1, keepdims=True)
            return centered * jax.lax.rsqrt(ms + 1e-6)

        feats = jnp.dot(rms(x), wpatch_ref[...], preferred_element_type=jnp.float32) + bpatch_ref[0]
        for i in range(n_blocks):
            h = jnp.dot(rms(feats), upw_ref[i], preferred_element_type=jnp.float32) + upb_ref[i]
            h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
            feats = feats + jnp.dot(h, dnw_ref[i], preferred_element_type=jnp.float32) + dnb_ref[i]

        # Pooling: scores a = feats @ Q -> (T*P, heads)
        a = jnp.dot(feats, poolq_ref[...], preferred_element_type=jnp.float32)
        e = jnp.exp(a - jnp.max(a))  # global shift for stability (cancels in ratio)
        e3 = e.reshape(clip_tile, num_patches_padded, heads)
        feats3 = feats.reshape(clip_tile, num_patches_padded, hidden)

        pooled_heads = []
        for h in range(heads):
            g = e3[:, :, h : h + 1] * feats3  # (T, P, hidden)
            numer1 = jnp.einsum(
                "wp,bpd->bwd", band_ref[h], g, preferred_element_type=jnp.float32
            )
            ek = jnp.einsum(
                "kwp,bp->bwk", selk_ref[...], e3[:, :, h], preferred_element_type=jnp.float32
            )  # (T, W, 19)
            numer2 = jnp.einsum(
                "bwk,kd->bwd", ek, posmat_ref[h], preferred_element_type=jnp.float32
            )
            denom = jnp.einsum(
                "wp,bp->bw", band_ref[h], e3[:, :, h], preferred_element_type=jnp.float32
            )
            pooled_heads.append((numer1 + numer2) / (denom[:, :, None] + 1e-9))
        pooled = jnp.concatenate(pooled_heads, axis=-1)  # (T, W, heads*hidden)

        flat = pooled.reshape(clip_tile * n_windows, heads * hidden)
        out = jnp.dot(rms(flat), whead_ref[...], preferred_element_type=jnp.float32) + bhead_ref[0]
        out_ref[...] = out.reshape(clip_tile, n_windows, cfg.embedding_dim)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((clip_tile, num_patches_padded, cfg.patch_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(band.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sel_k.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(posmat.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pool_q.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_head.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_patch.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_patch_row.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(up_w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(up_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dn_w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dn_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_head_row.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (clip_tile, n_windows, cfg.embedding_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total_b, n_windows, cfg.embedding_dim), jnp.float32),
        interpret=interpret,
    )(
        patches_in,
        jnp.asarray(band),
        jnp.asarray(sel_k),
        jnp.asarray(posmat),
        jnp.asarray(pool_q),
        jnp.asarray(w_head),
        jnp.asarray(w_patch),
        jnp.asarray(b_patch_row),
        jnp.asarray(up_w),
        jnp.asarray(up_b),
        jnp.asarray(dn_w),
        jnp.asarray(dn_b),
        jnp.asarray(b_head_row),
    )
    return out[:b]
