"""
Single-kernel featurization: raw audio -> (b, n_windows, 96) embeddings.

PERF.md's remaining-headroom analysis: with the two-kernel pipeline
(melspec_kernel + embedding_kernel) the (b, F, 32) spectrogram round-trips
HBM between the kernels — 37 MB written + 37 MB read per 2048-clip batch
(only ~0.15 ms at the true ~500 GB/s streaming rate; the round-2 "78 GB/s"
figure was the dispatch tax, see PERF.md) — plus a second kernel dispatch
(~3.3 ms of tunnel tax, the actual motivation). This kernel fuses the whole
chain per clip tile:

    audio hops -> shifted-hop DFT matmuls -> power -> mel -> log scale
    -> frame->patch redistribution -> trunk MLPs -> banded window pooling
    -> head

so HBM traffic is exactly: audio in (once) + (b, W, 96) out + parameters.

The one new problem fusion creates is layout: patches concatenate 4
consecutive 32-bin frames along the LANE dim (patch_dim = 128), but the mel
stage produces frames along the SUBLANE dim, and Mosaic cannot reshape
sublane<->lane. Solved with two matmul constants (no reshape anywhere):

    rows_f = SELP[f] @b logmel        SELP[f][p, pf*p+f] = 1   (T, P, F)x(T, F, 32)
    patches = sum_f merge(rows_f) @ E[f]   E[f] = I32 into lanes [32f:32f+32)

Everything else reuses the probed-construct bodies from melspec_kernel
and embedding_kernel (`_trunk_pool_body`). Per-chunk logmel blocks are
accumulated into ``rows_f`` as they are produced, so no full-spectrogram
VMEM scratch is needed.

MEASURED RESULT (v5e, 2048 x 1.44 s clips): numerically EXACT vs the
two-kernel pipeline (maxabs diff 0.0) but SLOWER — 9.1 ms vs 7.2 ms:

* the spectrogram HBM round-trip this kernel eliminates was already hidden
  by Pallas grid pipelining (blocks stream in/out while other grid steps
  compute), so the predicted ~0.9 ms bandwidth saving never shows up in
  wall clock;
* the redistribution matmuls MUST run at ``Precision.HIGHEST`` (without it
  Mosaic computes them at reduced precision, silently rounding the log-mel
  to bf16-class accuracy: mean output error 0.038 vs 0.0035) — and
  HIGHEST-precision f32 passes on the MXU cost ~3x;
* the fused working set needs a raised scoped-VMEM limit (32 MB) and a
  smaller FRAME_CHUNK (32), adding ~11% padded DFT work for the canonical
  141-frame clip.

Kept as ``featurize_batch(pooling="mega")`` with this negative result
documented (PERF.md "What fusion does NOT buy"); production stays on the
two-kernel pipeline (``pooling="fused"``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import MEL_BINS, MEL_HOP_LENGTH
from heybuddy_tpu.models.embedding_net import EmbeddingNetConfig
from heybuddy_tpu.ops.melspec import num_frames
from heybuddy_tpu.ops.pallas.embedding_kernel import _pool_constants, _trunk_pool_body
from heybuddy_tpu.ops.pallas.melspec_kernel import (
    N_FREQ_PAD,
    _constants as _mel_constants,
)

# Frames per inner mel iteration. Smaller than melspec_kernel's 48: the mega
# kernel also holds the trunk/pool working set in VMEM, and 48-frame spectrum
# intermediates pushed the scoped-vmem allocation 652 KB over the 16 MB limit
# with HIGHEST-precision redistribution matmuls. Must be a multiple of 8.
FRAME_CHUNK = 32

__all__ = ["fused_featurize"]


@functools.lru_cache(maxsize=None)
def _distribute_constants(
    patch_frames: int, num_patches: int, p_pad_to: int, f_pad: int, mel_bins: int,
    frame_chunk: int = FRAME_CHUNK,
) -> Tuple[np.ndarray, np.ndarray]:
    """(SELP (pf*n_chunks, P, FRAME_CHUNK), E (pf, mel, pf*mel)) frame->patch
    redistribution constants.

    SELP is pre-split per frame chunk so the kernel only ever LEADING-indexes
    it (``selp_ref[f * n_chunks + c]``): lane-dim slicing of a loaded value at
    a 48-lane offset is exactly the kind of op Mosaic mislowers silently.
    SELP[f*C+c][p, j] = 1  iff frame ``c*FRAME_CHUNK + j`` is the ``f``-th
    frame of patch ``p``.
    """
    n_chunks = f_pad // frame_chunk
    selp = np.zeros((patch_frames * n_chunks, p_pad_to, frame_chunk), np.float32)
    emb = np.zeros((patch_frames, mel_bins, patch_frames * mel_bins), np.float32)
    for f in range(patch_frames):
        for p in range(num_patches):
            frame = p * patch_frames + f
            if frame < f_pad:
                c, j = divmod(frame, frame_chunk)
                selp[f * n_chunks + c, p, j] = 1.0
        emb[f, :, f * mel_bins : (f + 1) * mel_bins] = np.eye(mel_bins, dtype=np.float32)
    return selp, emb


def fused_featurize(
    params: Dict[str, Any],
    audio: jax.Array,
    window_starts: Sequence[int],
    config: Optional[EmbeddingNetConfig] = None,
    clip_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """
    (b, t) int16-range float32 audio + static window starts -> (b, W, 96),
    matching ``mel_spectrogram`` + ``apply_spectrogram_banded(bfloat16)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = config or EmbeddingNetConfig()
    if audio.ndim == 1:
        audio = audio[None]
    b, t = audio.shape
    hop = MEL_HOP_LENGTH
    frames = num_frames(t)
    f_pad = -(-frames // FRAME_CHUNK) * FRAME_CHUNK
    n_chunks = f_pad // FRAME_CHUNK
    n_hops = f_pad + 3  # frame f uses hops f..f+3 (512 = 3 hops + 32)

    usable = (frames // cfg.patch_frames) * cfg.patch_frames
    num_patches = usable // cfg.patch_frames
    p_pad_to = -(-num_patches // 8) * 8
    starts = tuple(int(s) for s in window_starts)
    n_windows = len(starts)
    heads = cfg.pool_heads
    hidden = cfg.hidden_dim
    wh = n_windows * heads

    # ---- audio -> hop blocks (free reshape outside the kernel) -------------
    pad_t = n_hops * hop - t
    if pad_t > 0:
        audio = jnp.pad(audio, ((0, 0), (0, pad_t)))
    elif pad_t < 0:
        audio = audio[:, : n_hops * hop]
    pad_b = (-b) % clip_tile
    if pad_b:
        audio = jnp.pad(audio, ((0, pad_b), (0, 0)))
    total_b = audio.shape[0]
    hops = audio.reshape(total_b, n_hops, hop)

    # ---- constants ----------------------------------------------------------
    basis_blocks, hop_offsets, fb = _mel_constants()
    selp_np, emb_np = _distribute_constants(
        cfg.patch_frames, num_patches, p_pad_to, f_pad, cfg.mel_bins
    )
    pool = _pool_constants(params, starts, cfg, num_patches, p_pad_to)

    compute = jnp.bfloat16
    w_patch = jnp.asarray(params["patch_proj"]["w"], compute)
    b_patch = jnp.asarray(params["patch_proj"]["b"], jnp.float32)[None]
    n_blocks = len(params["trunk"])
    up_w = jnp.stack([jnp.asarray(blk["up"]["w"], compute) for blk in params["trunk"]])
    up_b = jnp.stack([jnp.asarray(blk["up"]["b"], jnp.float32) for blk in params["trunk"]])
    dn_w = jnp.stack([jnp.asarray(blk["down"]["w"], compute) for blk in params["trunk"]])
    dn_b = jnp.stack([jnp.asarray(blk["down"]["b"], jnp.float32) for blk in params["trunk"]])
    w_head = jnp.asarray(params["head"]["w"], compute)
    b_head = jnp.asarray(params["head"]["b"], jnp.float32)[None]
    q_c = pool["q"].astype(compute)

    from heybuddy_tpu.constants import MEL_LOG_EPS, MEL_SCALE_ADD, MEL_SCALE_DIV

    T = clip_tile
    P = p_pad_to
    pf = cfg.patch_frames

    def kernel(hops_ref, basis_ref, fb_ref, selp_ref, emb_ref,
               band_ref, posp_ref, tileh_ref, gs_ref, selh_ref,
               wp_ref, bp_ref, upw_ref, upb_ref, dnw_ref, dnb_ref,
               q_ref, wh_ref, bh_ref, out_ref):
        # ---- mel chain per frame chunk, redistributed into patch rows -------
        rows = [None] * pf  # rows[f]: (T, P, 32) = frames pf*p+f of each patch
        for c in range(n_chunks):
            f0 = c * FRAME_CHUNK
            spectrum = None
            for idx, j in enumerate(hop_offsets):
                block = hops_ref[:, f0 + j : f0 + j + FRAME_CHUNK, :]
                x = block.reshape(T * FRAME_CHUNK, hop)
                part = jnp.dot(x, basis_ref[idx], preferred_element_type=jnp.float32)
                spectrum = part if spectrum is None else spectrum + part
            re = spectrum[:, :N_FREQ_PAD]
            im = spectrum[:, N_FREQ_PAD:]
            power = re * re + im * im
            mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
            logmel = jnp.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD
            lm3 = logmel.reshape(T, FRAME_CHUNK, MEL_BINS)
            for f in range(pf):
                sel_b = jnp.broadcast_to(
                    selp_ref[f * n_chunks + c][None], (T, P, FRAME_CHUNK)
                )
                part = jax.lax.dot_general(
                    sel_b, lm3,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (T, P, 32)
                rows[f] = part if rows[f] is None else rows[f] + part

        # ---- lane redistribution: patches[:, 32f:32f+32] = rows_f -----------
        patches = None
        for f in range(pf):
            x2 = rows[f].reshape(T * P, MEL_BINS)
            part = jnp.dot(
                x2, emb_ref[f],
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            patches = part if patches is None else patches + part

        out_ref[...] = _trunk_pool_body(
            patches,
            band_ref[...], posp_ref[...], tileh_ref[...], gs_ref[...], selh_ref[...],
            wp_ref[...], bp_ref[...], upw_ref[...], upb_ref[...],
            dnw_ref[...], dnb_ref[...], q_ref[...], wh_ref[...], bh_ref[...],
            T=T, P=P, heads=heads, hidden=hidden, n_windows=n_windows,
            n_blocks=n_blocks, compute=compute,
        )

    out = pl.pallas_call(
        kernel,
        grid=(total_b // T,),
        in_specs=[
            pl.BlockSpec((T, n_hops, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(basis_blocks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(selp_np.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(emb_np.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
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
        # The fused working set (hop blocks + spectrum staging + trunk/pool
        # activations + HIGHEST-precision matmul staging) needs ~17 MB of
        # scoped VMEM; the Mosaic default limit is 16 MB, well under the
        # hardware's capacity, so raise it rather than shrink the clip tile
        # (halving the tile doubles per-grid-step overhead).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        hops, jnp.asarray(basis_blocks), jnp.asarray(fb),
        jnp.asarray(selp_np), jnp.asarray(emb_np),
        pool["band"], pool["posp"], pool["tile_h"], pool["gs"], pool["sel_h"],
        w_patch, b_patch, up_w, up_b, dn_w, dn_b, q_c, w_head, b_head,
    )
    return out[:b]
