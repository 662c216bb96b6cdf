"""
Fused Pallas mel-spectrogram kernel.

The XLA path (ops/melspec.py) materializes framed audio and the complex
spectrum in HBM between its matmuls (~500 MB of intermediates per 2048-clip
batch); true HBM streaming on this device is ~500-700 GB/s (PERF.md,
tax-corrected — the round-2 "78 GB/s" belief was the ~3.3 ms/dispatch
tunnel tax misread as bandwidth), so the intermediates cost well under 1 ms
of device time. The fused kernel's real wins are avoiding the extra
dispatches and pass structure: one program does the whole chain in VMEM per
clip tile:

    audio hops -> 4 shifted matmuls vs the windowed-DFT basis -> power ->
    mel filterbank -> log -> x/10+2

HBM traffic becomes audio in (once) + the patch/spectrogram output. With the
fused embedding kernel the full featurization pipeline measures 6.53 ms per
2048 clips wall / ~3.8 ms device time on v5e (the ~3.3 ms/call dispatch tax
accounts for the difference — PERF.md), 468k clips/s at the production
16384-clip batch, up from 13.5 ms / 151k for the XLA paths.

Layout rules respected for Mosaic (the round-1 kernel's failure was 3D
contractions / sublane-lane shape casts):
* audio arrives pre-reshaped (outside, free) to (b, n_hops, 160) so frames
  are built by SHIFTED HOP SLICES + per-block matmuls — the frame matrix
  (hop j feeds basis rows [160j:160j+160]) is never materialized;
* every matmul is 2D with only leading-dimension merges;
* the DFT frequency band is padded to 128 lanes so re/im split on an aligned
  boundary.

Numerics: float32 matmuls (Mosaic native), exactly matching the XLA path at
``precision=HIGHEST``-level accuracy.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import (
    MEL_BINS,
    MEL_F_MAX,
    MEL_F_MIN,
    MEL_HOP_LENGTH,
    MEL_LOG_EPS,
    MEL_N_FFT,
    MEL_SCALE_ADD,
    MEL_SCALE_DIV,
    MEL_WIN_LENGTH,
    SAMPLE_RATE,
)
from heybuddy_tpu.ops.melspec import dft_basis, mel_filterbank, num_frames

__all__ = ["mel_spectrogram_pallas", "mel_patches_pallas", "FRAME_CHUNK"]

FRAME_CHUNK = 48  # frames computed per inner iteration (multiple of 8)
N_FREQ_PAD = 128  # mel band (124 bins) padded to one lane tile


@functools.lru_cache(maxsize=None)
def _constants() -> Tuple[np.ndarray, Tuple[int, ...], np.ndarray]:
    """(basis blocks (J, 160, 256), their hop offsets, filterbank (128, 32))."""
    from heybuddy_tpu.ops.melspec import mel_band_freqs

    n_freqs = N_FREQ_PAD
    assert n_freqs >= mel_band_freqs(), (
        f"N_FREQ_PAD ({n_freqs}) no longer covers the mel band "
        f"({mel_band_freqs()} bins; MEL_F_MAX changed?) — raising it keeps "
        "the fused path numerically identical to ops.melspec"
    )
    basis = dft_basis(MEL_N_FFT, MEL_WIN_LENGTH, None)  # (512, 2*257)
    full_bins = MEL_N_FFT // 2 + 1
    # keep the low n_freqs bins of both the cos and sin column blocks
    basis = np.concatenate(
        [basis[:, :n_freqs], basis[:, full_bins : full_bins + n_freqs]], axis=1
    )  # (512, 256)
    hop = MEL_HOP_LENGTH
    blocks = np.zeros((4, hop, 2 * n_freqs), np.float32)
    for j in range(4):
        rows = basis[j * hop : min((j + 1) * hop, MEL_N_FFT)]
        blocks[j, : rows.shape[0]] = rows
    # The centered 400-sample Hann window zeroes basis rows outside [56, 456),
    # so entirely-zero hop blocks (j=3: rows 480..511) are dropped — 25% of
    # the DFT matmul work for the default geometry.
    keep = [j for j in range(4) if np.abs(blocks[j]).max() > 0]
    fb = mel_filterbank(MEL_BINS, MEL_N_FFT, SAMPLE_RATE, MEL_F_MIN, MEL_F_MAX)
    fb_pad = np.zeros((n_freqs, MEL_BINS), np.float32)
    fb_pad[: min(n_freqs, fb.shape[0])] = fb[:n_freqs]
    return blocks[keep].astype(np.float32), tuple(keep), fb_pad.astype(np.float32)


def mel_spectrogram_pallas(
    audio: jax.Array,
    clip_tile: int = 16,
    interpret: bool = False,
    frame_chunk: int = FRAME_CHUNK,
    dft_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """
    (b, t) int16-range float32 audio -> (b, n_frames, 32) scaled log-mel,
    identical contract to ``ops.melspec.mel_spectrogram``.

    ``dft_dtype=bfloat16`` casts the hop blocks and DFT basis to bf16 before
    the MXU dots (f32 accumulation) — a single MXU pass instead of the
    multi-pass reduced-precision default Mosaic uses for f32 inputs.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if audio.ndim == 1:
        audio = audio[None]
    b, t = audio.shape
    hop = MEL_HOP_LENGTH
    frames = num_frames(t)
    f_pad = -(-frames // frame_chunk) * frame_chunk
    n_chunks = f_pad // frame_chunk
    n_hops = f_pad + 3  # frame f uses hops f..f+3 (512 = 3 hops + 32)

    pad_t = n_hops * hop - t
    if pad_t > 0:
        audio = jnp.pad(audio, ((0, 0), (0, pad_t)))
    elif pad_t < 0:
        audio = audio[:, : n_hops * hop]
    pad_b = (-b) % clip_tile
    if pad_b:
        audio = jnp.pad(audio, ((0, pad_b), (0, 0)))
    total_b = audio.shape[0]
    hops = audio.reshape(total_b, n_hops, hop)  # free reshape (minor split)

    basis_blocks, hop_offsets, fb = _constants()

    def kernel(hops_ref, basis_ref, fb_ref, out_ref):
        for c in range(n_chunks):
            f0 = c * frame_chunk
            spectrum = None
            for idx, j in enumerate(hop_offsets):
                block = hops_ref[:, f0 + j : f0 + j + frame_chunk, :]
                x = block.reshape(clip_tile * frame_chunk, hop).astype(dft_dtype)
                part = jnp.dot(
                    x, basis_ref[idx], preferred_element_type=jnp.float32
                )
                spectrum = part if spectrum is None else spectrum + part
            re = spectrum[:, :N_FREQ_PAD]
            im = spectrum[:, N_FREQ_PAD:]
            power = re * re + im * im
            mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
            logmel = jnp.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD
            out_ref[:, f0 : f0 + frame_chunk, :] = logmel.reshape(
                clip_tile, frame_chunk, MEL_BINS
            )

    out = pl.pallas_call(
        kernel,
        grid=(total_b // clip_tile,),
        in_specs=[
            pl.BlockSpec(
                (clip_tile, n_hops, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(basis_blocks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (clip_tile, f_pad, MEL_BINS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total_b, f_pad, MEL_BINS), jnp.float32),
        interpret=interpret,
    )(hops, jnp.asarray(basis_blocks, dft_dtype), jnp.asarray(fb))
    return out[:b, :frames]


@functools.lru_cache(maxsize=None)
def _patch_pack_constants(
    f_pad: int, num_patches: int, p_pad: int, patch_frames: int, mel_bins: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Constant selector/placement matrices packing frames into patch rows:

        patches[t, p, k*mel_bins:(k+1)*mel_bins] = logmel[t, p*patch_frames+k, :]

    expressed as ``sum_k (S_k @b logmel) @ E_k`` — a sublane selection matmul
    plus a lane placement matmul, the only Mosaic-lowerable way to move the
    frame axis into lanes (sublane<->lane reshapes do not lower; see module
    docstring). Rows p >= num_patches select nothing, so pad patches are
    exactly the zeros ``jnp.pad`` would produce.
    """
    sel = np.zeros((patch_frames, p_pad, f_pad), np.float32)
    place = np.zeros((patch_frames, mel_bins, patch_frames * mel_bins), np.float32)
    for k in range(patch_frames):
        for p in range(num_patches):
            sel[k, p, p * patch_frames + k] = 1.0
        for m in range(mel_bins):
            place[k, m, k * mel_bins + m] = 1.0
    return sel, place


def mel_patches_pallas(
    audio: jax.Array,
    clip_tile: int = 16,
    interpret: bool = False,
    frame_chunk: int = FRAME_CHUNK,
    dft_dtype: jnp.dtype = jnp.float32,
    dft_mode: str = "chunked",
) -> Tuple[jax.Array, int]:
    """
    (b, t) int16-range float32 audio -> ((b_padded, p_pad, patch_frames*mel),
    num_patches): the scaled log-mel of ``mel_spectrogram_pallas`` emitted
    directly in the PADDED PATCH LAYOUT the fused embedding kernel consumes
    (``fused_embedding_from_patches``). Skipping the spectrogram layout
    entirely removes the slice+reshape+pad glue between the two production
    kernels — a measured 1.6 ms HBM copy per 2048-clip batch on v5e (~22% of
    the whole featurization pipeline). Batch stays padded to ``clip_tile``;
    callers slice the final embedding output instead.

    ``dft_mode``:

    * ``"chunked"`` (production): the per-frame-chunk formulation
      ``mel_spectrogram_pallas`` uses — J x n_chunks (T·48, 160)x(160, 256)
      MXU dots per grid step. When the clip length is a whole, 8-aligned
      number of hops (the canonical 23040), the trailing pad hops the junk
      frames past ``frames`` would read are zero-filled in a VMEM scratch
      instead of via ``jnp.pad`` — the pad op is a full-batch HBM copy that
      measured 1.3 ms inside the 2048-clip pipeline (a bare pad of the
      189 MB batch is 4.1 ms standalone).
    * ``"fat"``: ONE (T·n_hops, 160)x(160, J·256) dot per grid step computes
      every hop-row x basis-block product, then frames are assembled by three
      shifted sublane slices + adds. Numerically identical to ``"chunked"``
      (same partials, same add order). MEASURED NEGATIVE RESULT on v5e: 5.88
      vs 5.63 ms per 2048 clips — the mel kernel's 13 TF/s effective DFT rate
      is not issue-count-bound (PERF.md); kept for attribution sweeps.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if audio.ndim == 1:
        audio = audio[None]
    b, t = audio.shape
    hop = MEL_HOP_LENGTH
    frames = num_frames(t)
    f_pad = -(-frames // frame_chunk) * frame_chunk
    n_chunks = f_pad // frame_chunk
    if dft_mode == "fat":
        # hop rows must reshape back from (T*n_hops, .) -> (T, n_hops, .):
        # sublane SPLITS need the inner dim to be a multiple of the 8-row
        # tile (PERF.md layout rules), so pad the hop axis to 8.
        n_hops = f_pad + 8
    elif dft_mode == "chunked":
        n_hops = f_pad + 3  # frame f uses hops f..f+3 (512 = 3 hops + 32)
    else:
        raise ValueError(f"unknown dft_mode {dft_mode!r}; expected fat/chunked")

    # No-copy fast path: when the clip is a whole, 8-aligned number of hops
    # (23040 -> 144), skip the jnp.pad HBM copy and zero-extend the missing
    # trailing hops in a VMEM scratch inside the kernel. Real frames only
    # ever read hops <= frames+1 < t/hop, so the zero tail feeds junk frames
    # past ``frames`` that the patch selector never picks up.
    n_avail = t // hop
    tail_scratch = (
        dft_mode == "chunked"
        and n_hops * hop > t
        and t % hop == 0
        and n_avail % 8 == 0
    )

    # patch geometry must match fused_embedding_windows exactly
    patch_frames = 4
    usable = (frames // patch_frames) * patch_frames
    num_patches = usable // patch_frames
    p_pad = -(-num_patches // 8) * 8
    patch_dim = patch_frames * MEL_BINS

    if tail_scratch:
        in_hops = n_avail
        # scratch rows: n_hops rounded up to the 8-row sublane tile
        n_hops_s = -(-n_hops // 8) * 8
    else:
        in_hops = n_hops
        pad_t = n_hops * hop - t
        if pad_t > 0:
            audio = jnp.pad(audio, ((0, 0), (0, pad_t)))
        elif pad_t < 0:
            audio = audio[:, : n_hops * hop]
    pad_b = (-b) % clip_tile
    if pad_b:
        audio = jnp.pad(audio, ((0, pad_b), (0, 0)))
    total_b = audio.shape[0]
    hops = audio.reshape(total_b, in_hops, hop)

    basis_blocks, hop_offsets, fb = _constants()
    n_blocks, _, spec_w = basis_blocks.shape  # spec_w = 2 * N_FREQ_PAD
    sel_np, place_np = _patch_pack_constants(
        f_pad, num_patches, p_pad, patch_frames, MEL_BINS
    )

    T = clip_tile

    def patch_pack(lm, sel_ref, place_ref, out_ref):
        # (T, f_pad, 32) scaled log-mel -> (T, p_pad, patch_dim) patch rows
        acc = None
        for k in range(patch_frames):
            sel_b = jnp.broadcast_to(sel_ref[k], (T, p_pad, f_pad))
            picked = jax.lax.dot_general(                          # (T, p_pad, 32)
                sel_b, lm,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            placed = jnp.dot(                                      # (T*p_pad, patch_dim)
                picked.reshape(T * p_pad, MEL_BINS), place_ref[k],
                preferred_element_type=jnp.float32,
            )
            acc = placed if acc is None else acc + placed
        out_ref[...] = acc.reshape(T, p_pad, patch_dim)

    def kernel_chunked(hops_ref, basis_ref, fb_ref, sel_ref, place_ref, out_ref,
                       scratch, *hops_scratch):
        if tail_scratch:
            src = hops_scratch[0]
            src[:, :n_avail, :] = hops_ref[...]
            src[:, n_avail:, :] = jnp.zeros(
                (T, n_hops_s - n_avail, hop), jnp.float32
            )
        else:
            src = hops_ref
        for c in range(n_chunks):
            f0 = c * frame_chunk
            spectrum = None
            for idx, j in enumerate(hop_offsets):
                block = src[:, f0 + j : f0 + j + frame_chunk, :]
                x = block.reshape(T * frame_chunk, hop).astype(dft_dtype)
                part = jnp.dot(
                    x, basis_ref[idx], preferred_element_type=jnp.float32
                )
                spectrum = part if spectrum is None else spectrum + part
            re = spectrum[:, :N_FREQ_PAD]
            im = spectrum[:, N_FREQ_PAD:]
            power = re * re + im * im
            mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
            logmel = jnp.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD
            scratch[:, f0 : f0 + frame_chunk, :] = logmel.reshape(
                T, frame_chunk, MEL_BINS
            )
        patch_pack(scratch[...], sel_ref, place_ref, out_ref)

    def kernel_fat(hops_ref, basis_ref, fb_ref, sel_ref, place_ref, out_ref):
        # one MXU dot computes every (hop row x basis block) product
        x = hops_ref[...].reshape(T * n_hops, hop).astype(dft_dtype)
        z = jnp.dot(x, basis_ref[...], preferred_element_type=jnp.float32)
        z3 = z.reshape(T, n_hops, n_blocks * spec_w)
        spectrum = None
        for idx, j in enumerate(hop_offsets):
            # lane offsets idx*spec_w are 128-aligned (spec_w = 256)
            part = z3[:, j : j + f_pad, idx * spec_w : (idx + 1) * spec_w]
            spectrum = part if spectrum is None else spectrum + part
        flat = spectrum.reshape(T * f_pad, spec_w)
        re = flat[:, :N_FREQ_PAD]
        im = flat[:, N_FREQ_PAD:]
        power = re * re + im * im
        mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
        logmel = jnp.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD
        patch_pack(logmel.reshape(T, f_pad, MEL_BINS), sel_ref, place_ref, out_ref)

    if dft_mode == "fat":
        # basis blocks concatenated along the output axis: (160, J*256)
        basis_in = np.concatenate(list(basis_blocks), axis=1)
        basis_spec = pl.BlockSpec(basis_in.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        kernel = kernel_fat
        scratch_shapes = []
        # z alone is (T, n_hops, 768) f32 ~ 7.5 MB at T=16 — past the 16 MB
        # scoped-VMEM default once double-buffered I/O is counted.
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    else:
        basis_in = basis_blocks
        basis_spec = pl.BlockSpec(
            basis_blocks.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        kernel = kernel_chunked
        scratch_shapes = [pltpu.VMEM((T, f_pad, MEL_BINS), jnp.float32)]
        compiler_params = None
        if tail_scratch:
            scratch_shapes.append(pltpu.VMEM((T, n_hops_s, hop), jnp.float32))
            # the hop scratch (+1.6 MB at T=16) pushes the kernel just past
            # the 16 MB scoped-VMEM default (measured: 17.25 MB)
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            )

    out = pl.pallas_call(
        kernel,
        grid=(total_b // T,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((T, in_hops, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            basis_spec,
            pl.BlockSpec(fb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sel_np.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(place_np.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, p_pad, patch_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total_b, p_pad, patch_dim), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(hops, jnp.asarray(basis_in, dft_dtype), jnp.asarray(fb),
      jnp.asarray(sel_np), jnp.asarray(place_np))
    return out, num_patches
