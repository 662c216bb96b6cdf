"""
Fused Pallas kernel for the frozen embedding network (trunk + banded pooling
+ head) — round-2 rewrite.

The round-1 formulation died on Mosaic's unsupported sublane<->lane shape
casts (3D einsum reshapes). This version is built exclusively from constructs
probed to lower on this device:

* 2D matmuls with leading-dimension merges only,
* BATCHED ``jax.lax.dot_general`` (batch dim 0, probed OK),
* trailing-dim ``swapaxes`` (probed OK),
* constant 0/1 selector matmuls instead of any lane-dim reshape/concat.

Math identical to ``embedding_net.apply_spectrogram_banded``: per clip tile

    patches -> rms -> trunk MLPs -> patch scores a = f@Q ->
    softmax over each window band via  W = band*e_a / denom ->
    pooled = W @b feats  +  W @wh POSP        (POSP[wh,p,:] = pos[k(w,p),:])
    -> grouped rms over (head, hidden) -> head matmul split per head

HBM traffic per batch: patches in + (b, W, 96) out + small per-param
constants — everything else stays in VMEM. The XLA banded path moves ~10
intermediates through HBM and measured ~5.9 ms per 2048 clips wall; this
kernel measures 4.5 ms wall (v5e, 459k clips/s standalone; both numbers
carry the ~3.3 ms/call dispatch tax — device times are ~2.6 vs ~1.2 ms,
see PERF.md) and is the production TPU path via
``featurize_batch(pooling="auto")``.

Mosaic layout rules this kernel obeys (probed on v5e):
* batched ``dot_general`` requires BOTH batch dims at position 0;
* sublane merges (T, P, c) -> (T*P, c) are free, but SPLITS need the inner
  dim to be a multiple of the 8-row sublane tile (the patch axis is padded
  to 8 with zero band weights);
* leading-dim ``swapaxes(0, 1)`` and trailing-dim ``swapaxes(1, 2)`` lower;
  sublane<->lane reshapes do not.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.models.embedding_net import EmbeddingNetConfig, _band_constants

__all__ = ["fused_embedding_windows", "fused_embedding_from_patches"]

GELU_K = np.float32(1.0 / np.sqrt(2.0))


def _erf(x):
    # Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7): Mosaic has no erf.
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    tt = 1.0 / (1.0 + 0.3275911 * ax)
    poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (1.421413741
           + tt * (-1.453152027 + tt * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _rms(v, compute):
    vf = v.astype(jnp.float32)
    mean = jnp.mean(vf, axis=-1, keepdims=True)
    centered = vf - mean
    ms = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return (centered * jax.lax.rsqrt(ms + 1e-6)).astype(compute)


def _batched_dot(a, bmat):
    """Batched matmul with BOTH batch dims at position 0 (the only batched
    ``dot_general`` form Mosaic lowers on this device)."""
    return jax.lax.dot_general(
        a, bmat,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _trunk_pool_body(
    x,
    band, posp, tile_h, gs, sel_h,
    w_patch, b_patch, up_w, up_b, dn_w, dn_b, q, w_head, b_head,
    *,
    T: int, P: int, heads: int, hidden: int, n_windows: int, n_blocks: int,
    compute,
    ablate: frozenset = frozenset(),
):
    """
    Value-level kernel math shared by ``fused_embedding_windows`` and the
    audio->embedding mega-kernel (featurize_kernel.py): patches
    (T*P, patch_dim) -> (T, n_windows, 96). Every construct here is probed to
    lower on Mosaic (see module docstring).
    """
    wh = n_windows * heads
    # ``ablate`` is a PROFILING-ONLY switch (scripts/kernel_perf_sweep.py):
    # each member replaces one stage with a cheap stand-in of the same shape
    # so compile-and-time diffs attribute the kernel's cost per stage. Never
    # set in production paths.
    if "noop" in ablate:
        # Pure streaming floor: read the input block, write a trivial output.
        s = jnp.sum(x.astype(jnp.float32)) * 0.0
        return jnp.broadcast_to(s, (T, n_windows, b_head.shape[-1])) + b_head[0][None, None]
    # ---- trunk over all patches (2D, leading merge) -------------------------
    feats = (
        jnp.dot(_rms(x, compute), w_patch, preferred_element_type=jnp.float32) + b_patch[0]
    ).astype(compute)
    for i in range(n_blocks if "trunk" not in ablate else 0):
        pre = feats if "trunk_rms" in ablate else _rms(feats, compute)
        h = jnp.dot(pre, up_w[i], preferred_element_type=jnp.float32) + up_b[i]
        if "gelu" in ablate:
            h = jnp.maximum(h, 0.0).astype(compute)
        else:
            h = (0.5 * h * (1.0 + _erf(h * GELU_K))).astype(compute)
        feats = feats + (
            jnp.dot(h, dn_w[i], preferred_element_type=jnp.float32) + dn_b[i]
        ).astype(compute)

    # ---- patch scores & band weights ----------------------------------------
    a = jnp.dot(feats, q, preferred_element_type=jnp.float32)  # (T*P, H)
    a3 = a.reshape(T, P, heads)
    if "softmax" in ablate:
        weights = jnp.broadcast_to(band[None], (T, wh, P)).astype(compute)
    else:
        a3 = a3 - jnp.max(a3, axis=1, keepdims=True)
        ea = jnp.exp(a3)                                          # (T, P, H) f32
        ea_t = jnp.swapaxes(ea, 1, 2)                             # (T, H, P)
        tile_b = jnp.broadcast_to(tile_h, (T, wh, heads))
        e_sel = _batched_dot(tile_b, ea_t)                        # (T, WH, P)
        bw = band[None] * e_sel
        denom = jnp.sum(bw, axis=2, keepdims=True)                # (T, WH, 1)
        weights = (bw / (denom + 1e-30)).astype(compute)

    # ---- pooled = W @b feats + W @wh POSP ------------------------------------
    feats3 = feats.reshape(T, P, hidden)
    if "pool_mm" in ablate:
        # Profiling stand-in: skip BOTH pooling batched dots, keep shapes.
        pooled = jnp.broadcast_to(
            feats3[:, :1].astype(jnp.float32), (T, wh, hidden)
        ) + jnp.sum(weights.astype(jnp.float32), axis=2, keepdims=True)
        numer1 = pooled
    else:
        numer1 = _batched_dot(weights, feats3)                # (T, WH, hidden)
    # Mosaic requires both batch dims at position 0 (probed: mixed positions
    # fail with "batch dims must be equal"), so swap WH to the front, run the
    # batched dot, and swap back (leading-dim swapaxes is supported).
    if "posp" in ablate or "pool_mm" in ablate:
        pooled = numer1
    else:
        weights_whT = jnp.swapaxes(weights, 0, 1)             # (WH, T, P)
        numer2 = _batched_dot(weights_whT, posp)              # (WH, T, hidden)
        pooled = numer1 + jnp.swapaxes(numer2, 0, 1)          # (T, WH, hidden) f32

    # ---- grouped rms over each window's (heads*hidden) -----------------------
    if "pool_rms" in ablate:
        norm = pooled.astype(compute)
    else:
        norm = _grouped_rms(pooled, gs, heads, hidden, compute)

    # ---- head: out = sum_h (SEL_h @b norm) @ W_head[h] ------------------------
    if "head_mm" in ablate:
        # Profiling stand-in: ONE unselected head dot instead of 4x(sel+head).
        out = jax.lax.dot_general(
            norm[:, :n_windows], w_head[:hidden],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out + b_head[0][None, None]
    out = None
    for h in range(heads):
        sel_b = jnp.broadcast_to(sel_h[h], (T, n_windows, wh)).astype(compute)
        norm_h = _batched_dot(sel_b, norm).astype(compute)     # (T, W, hidden)
        part = jax.lax.dot_general(
            norm_h, w_head[h * hidden : (h + 1) * hidden],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (T, W, 96)
        out = part if out is None else out + part
    return out + b_head[0][None, None]


def _grouped_rms(pooled, gs, heads, hidden, compute):
    denom_n = float(heads * hidden)
    rowsum = jnp.sum(pooled, axis=2)                          # (T, WH)
    mean_w = jnp.dot(rowsum, gs, preferred_element_type=jnp.float32) / denom_n
    mean_rep = jnp.dot(mean_w, gs.T, preferred_element_type=jnp.float32)
    centered = pooled - mean_rep[:, :, None]
    sqsum = jnp.sum(centered * centered, axis=2)              # (T, WH)
    ms_w = jnp.dot(sqsum, gs, preferred_element_type=jnp.float32) / denom_n
    scale_w = jax.lax.rsqrt(ms_w + 1e-6)
    scale_rep = jnp.dot(scale_w, gs.T, preferred_element_type=jnp.float32)
    return (centered * scale_rep[:, :, None]).astype(compute)  # (T, WH, hidden)


def _pool_constants(
    params: Dict[str, Any],
    starts: Tuple[int, ...],
    cfg: EmbeddingNetConfig,
    num_patches: int,
    p_pad_to: int,
):
    """XLA-side (cheap, parameter-dependent) constants for the pooling stage:
    band weights, positional pooled contributions, and the 0/1 selectors."""
    n_windows = len(starts)
    heads = cfg.pool_heads
    hidden = cfg.hidden_dim
    wh = n_windows * heads
    consts = _selector_constants(
        starts, cfg.patch_frames, cfg.window_patches, num_patches, heads
    )
    q = jnp.asarray(params["pool_query"], jnp.float32)          # (hidden, H)
    pos = jnp.asarray(params["pos"], jnp.float32)               # (19, hidden)
    c = pos @ q                                                  # (19, H)
    exp_c = jnp.exp(c - jnp.max(c))
    band = (
        jnp.transpose(jnp.take(exp_c, jnp.asarray(consts["k_index"]), axis=0), (0, 2, 1))
        * jnp.asarray(consts["selector"])[:, None, :]
    ).reshape(wh, num_patches)                                   # (WH, P) f32
    band = jnp.pad(band, ((0, 0), (0, p_pad_to - num_patches)))
    # POSP[wh, p, :] = pos[k(w,p), :] on the band (zeros elsewhere)
    posp = (
        jnp.take(pos, jnp.asarray(consts["k_index"]), axis=0)
        * jnp.asarray(consts["selector"])[:, :, None]
    )  # (W, P, hidden) f32
    posp = jnp.broadcast_to(posp[:, None], (n_windows, heads, num_patches, hidden)).reshape(
        wh, num_patches, hidden
    )
    posp = jnp.pad(
        posp, ((0, 0), (0, p_pad_to - num_patches), (0, 0))
    ).astype(jnp.bfloat16)
    return {
        "band": band,
        "posp": posp,
        "tile_h": jnp.asarray(consts["tile_h"]),
        "gs": jnp.asarray(consts["gs"]),
        "sel_h": jnp.asarray(consts["sel_h"]),
        "q": q,
    }


@functools.lru_cache(maxsize=None)
def _selector_constants(
    starts: Tuple[int, ...], patch_frames: int, window_patches: int, num_patches: int,
    heads: int,
) -> Dict[str, np.ndarray]:
    selector, k_index = _band_constants(starts, patch_frames, window_patches, num_patches)
    n_windows = len(starts)
    wh = n_windows * heads
    # TILE16[wh, h'] = 1{h' = h(wh)} : expands (t, H, P) scores to (t, WH, P)
    tile_h = np.zeros((wh, heads), np.float32)
    for w in range(n_windows):
        for h in range(heads):
            tile_h[w * heads + h, h] = 1.0
    # GS[wh, w'] = 1{w(wh) = w'} : group-sums the 4 head rows of each window
    gs = np.zeros((wh, n_windows), np.float32)
    sel_h = np.zeros((heads, n_windows, wh), np.float32)
    for w in range(n_windows):
        for h in range(heads):
            gs[w * heads + h, w] = 1.0
            sel_h[h, w, w * heads + h] = 1.0
    return {
        "selector": selector,
        "k_index": k_index,
        "tile_h": tile_h,
        "gs": gs,
        "sel_h": sel_h,
    }


def fused_embedding_windows(
    params: Dict[str, Any],
    spectrogram: jax.Array,
    window_starts: Sequence[int],
    config: EmbeddingNetConfig = None,
    clip_tile: int = 16,
    interpret: bool = False,
    vmem_limit_bytes: int = None,
    ablate: frozenset = frozenset(),
) -> jax.Array:
    """
    (b, frames, mel) spectrogram + static window starts -> (b, W, 96),
    matching ``apply_spectrogram_banded(..., compute_dtype=bfloat16)`` to
    bf16 tolerance.
    """
    cfg = config or EmbeddingNetConfig()
    b, frames, mel = spectrogram.shape
    usable = (frames // cfg.patch_frames) * cfg.patch_frames
    num_patches = usable // cfg.patch_frames
    # Mosaic supports sublane-dim merges freely but SPLITS (T*P, c)->(T, P, c)
    # only when the inner dim is a multiple of the 8-row sublane tile — pad
    # the patch axis to 8 and zero the band/posp constants on the pad rows so
    # the pooled math is untouched (zero band weight => zero contribution).
    p_pad_to = -(-num_patches // 8) * 8
    pad_b = (-b) % clip_tile
    patches_in = spectrogram[:, :usable].reshape(b, num_patches, cfg.patch_dim)
    patches_in = jnp.pad(
        patches_in, ((0, pad_b), (0, p_pad_to - num_patches), (0, 0))
    )
    out = fused_embedding_from_patches(
        params, patches_in, window_starts, num_patches,
        config=cfg, clip_tile=clip_tile, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes, ablate=ablate,
    )
    return out[:b]


def fused_embedding_from_patches(
    params: Dict[str, Any],
    patches: jax.Array,
    window_starts: Sequence[int],
    num_patches: int,
    config: EmbeddingNetConfig = None,
    clip_tile: int = 16,
    interpret: bool = False,
    vmem_limit_bytes: int = None,
    ablate: frozenset = frozenset(),
) -> jax.Array:
    """
    Padded-patch-layout entry: (total_b, p_pad, patch_dim) patches (batch a
    multiple of ``clip_tile``, patch rows >= ``num_patches`` zero) ->
    (total_b, W, 96). ``mel_patches_pallas`` emits this layout directly,
    removing the 1.6 ms slice+reshape+pad glue between the mel and embedding
    kernels (the production path via ``featurize_batch(pooling="fused")``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = config or EmbeddingNetConfig()
    total_b, p_pad_to, patch_dim = patches.shape
    if patch_dim != cfg.patch_dim:
        raise ValueError(f"patch dim {patch_dim} != config {cfg.patch_dim}")
    if total_b % clip_tile:
        raise ValueError(f"batch {total_b} not a multiple of clip_tile {clip_tile}")
    starts = tuple(int(s) for s in window_starts)
    n_windows = len(starts)
    heads = cfg.pool_heads
    hidden = cfg.hidden_dim
    wh = n_windows * heads
    pool = _pool_constants(params, starts, cfg, num_patches, p_pad_to)
    band, posp, q = pool["band"], pool["posp"], pool["q"]

    compute = jnp.bfloat16
    w_patch = jnp.asarray(params["patch_proj"]["w"], compute)
    b_patch = jnp.asarray(params["patch_proj"]["b"], jnp.float32)[None]
    n_blocks = len(params["trunk"])
    up_w = jnp.stack([jnp.asarray(blk["up"]["w"], compute) for blk in params["trunk"]])
    up_b = jnp.stack([jnp.asarray(blk["up"]["b"], jnp.float32) for blk in params["trunk"]])
    dn_w = jnp.stack([jnp.asarray(blk["down"]["w"], compute) for blk in params["trunk"]])
    dn_b = jnp.stack([jnp.asarray(blk["down"]["b"], jnp.float32) for blk in params["trunk"]])
    w_head = jnp.asarray(params["head"]["w"], compute)           # (H*hidden, 96)
    b_head = jnp.asarray(params["head"]["b"], jnp.float32)[None]
    q_c = q.astype(compute)

    tile_h_c = pool["tile_h"]                                    # (WH, H)
    gs_c = pool["gs"]                                            # (WH, W)
    sel_h_c = pool["sel_h"]                                      # (H, W, WH)

    T = clip_tile
    P = p_pad_to

    def kernel(patches_ref, band_ref, posp_ref, tileh_ref, gs_ref, selh_ref,
               wp_ref, bp_ref, upw_ref, upb_ref, dnw_ref, dnb_ref,
               q_ref, wh_ref, bh_ref, out_ref):
        x = patches_ref[...].reshape(T * P, cfg.patch_dim)
        out_ref[...] = _trunk_pool_body(
            x,
            band_ref[...], posp_ref[...], tileh_ref[...], gs_ref[...], selh_ref[...],
            wp_ref[...], bp_ref[...], upw_ref[...], upb_ref[...],
            dnw_ref[...], dnb_ref[...], q_ref[...], wh_ref[...], bh_ref[...],
            T=T, P=P, heads=heads, hidden=hidden, n_windows=n_windows,
            n_blocks=n_blocks, compute=compute, ablate=ablate,
        )

    compiler_params = None
    if vmem_limit_bytes is not None:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes)
    out = pl.pallas_call(
        kernel,
        grid=(total_b // T,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((T, P, cfg.patch_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, P, hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, n_windows), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n_windows, wh), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_patch.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_patch.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(up_w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(up_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dn_w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dn_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(q_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_head.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_head.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, n_windows, cfg.embedding_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total_b, n_windows, cfg.embedding_dim), jnp.float32),
        interpret=interpret,
    )(
        patches, band, posp, tile_h_c, gs_c, sel_h_c,
        w_patch, b_patch, up_w, up_b, dn_w, dn_b, q_c, w_head, b_head,
    )
    return out
