"""
Fused Pallas mel-spectrogram kernel.

The XLA path (ops/melspec.py) materializes framed audio and the complex
spectrum in HBM between kernels (~1.5 MB of intermediate traffic per 90 KB
clip). This kernel fuses hop-matmuls -> power -> mel projection -> log-scale
in one pass; every intermediate lives in VMEM and only the (frames, 32)
log-mel tile returns to HBM.

Mosaic-friendly formulation (no unaligned reshapes/slices):
    frame i = [hop_i | hop_{i+1} | hop_{i+2} | hop_{i+3}][:512]
    spectrum_i = sum_k hop_{i+k} @ B_k
where B_k are 160-row blocks of the windowed DFT basis (B_3 zero-padded past
row 512). The kernel computes P_k = hops @ B_k for ALL hops (one clean MXU
matmul per k) and aligns them with `pltpu.roll` shifts along the hop axis —
wrapped rows land past the last valid frame and are never read. Audio arrives
pre-reshaped to (batch, hops, 192) with zero lane padding so the contraction
dimension is exact.

Numerically identical (f32) to ops.melspec.mel_spectrogram for hop-aligned
inputs; callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import (
    MEL_BINS,
    MEL_HOP_LENGTH,
    MEL_LOG_EPS,
    MEL_N_FFT,
    MEL_SCALE_ADD,
    MEL_SCALE_DIV,
    MEL_WIN_LENGTH,
)
from heybuddy_tpu.ops.melspec import dft_basis, mel_band_freqs, mel_filterbank, num_frames

__all__ = ["fused_mel_spectrogram", "supports_fused"]

_HOP_PAD = 192  # hop length 160 zero-padded to the next lane-aligned size


@functools.lru_cache(maxsize=None)
def _hop_bases(n_freqs: int, hops_per_frame: int) -> np.ndarray:
    """
    (hops_per_frame, _HOP_PAD, 2*n_freqs) basis blocks: B_k covers frame rows
    [160k, 160(k+1)) of the windowed DFT basis (zero rows past n_fft and in
    the 160->192 lane padding).
    """
    basis = dft_basis(MEL_N_FFT, MEL_WIN_LENGTH, n_freqs)  # (512, 2*nf)
    out = np.zeros((hops_per_frame, _HOP_PAD, basis.shape[1]), dtype=np.float32)
    for k in range(hops_per_frame):
        lo = k * MEL_HOP_LENGTH
        hi = min(lo + MEL_HOP_LENGTH, basis.shape[0])
        if lo < basis.shape[0]:
            out[k, : hi - lo] = basis[lo:hi]
    return out


def supports_fused(num_samples: int) -> bool:
    if num_samples % MEL_HOP_LENGTH != 0:
        return False
    n = num_frames(num_samples)
    hops_per_frame = -(-MEL_N_FFT // MEL_HOP_LENGTH)
    return n >= 1 and (n - 1) + hops_per_frame <= num_samples // MEL_HOP_LENGTH


def fused_mel_spectrogram(
    audio: jax.Array,
    clip_tile: int = 8,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """
    (batch, t) float32 -> (batch, n_frames, MEL_BINS) in one fused kernel.

    ``compute_dtype=jnp.bfloat16`` runs the DFT matmuls at MXU-native rate with
    f32 accumulation (~1e-2 absolute log-mel error on int16-range audio — far
    below augmentation noise); float32 is bit-comparable to the XLA path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t = audio.shape
    assert supports_fused(t), f"unsupported length {t} for fused mel kernel"
    n = num_frames(t)
    hops_per_frame = -(-MEL_N_FFT // MEL_HOP_LENGTH)  # 4
    n_hops = t // MEL_HOP_LENGTH  # 144 for 1.44 s clips
    n_freqs = mel_band_freqs()
    bases = jnp.asarray(_hop_bases(n_freqs, hops_per_frame))  # (4, 192, 2nf)
    fb = jnp.asarray(mel_filterbank()[:n_freqs])  # (nf, 32)

    pad_b = (-b) % clip_tile
    if pad_b:
        audio = jnp.concatenate([audio, jnp.zeros((pad_b, t), audio.dtype)], axis=0)
    total_b = audio.shape[0]

    # Host-side layout: (B, n_hops, 160) zero-padded to lane-aligned 192.
    hops = audio.reshape(total_b, n_hops, MEL_HOP_LENGTH)
    hops = jnp.pad(hops, ((0, 0), (0, 0), (0, _HOP_PAD - MEL_HOP_LENGTH)))

    grid = (total_b // clip_tile,)
    two_nf = 2 * n_freqs

    def kernel(hops_ref, bases_ref, fb_ref, out_ref):
        block = hops_ref[...].reshape(clip_tile * n_hops, _HOP_PAD).astype(compute_dtype)
        bases_block = bases_ref[...].astype(compute_dtype)
        acc = jnp.dot(block, bases_block[0], preferred_element_type=jnp.float32)
        for k in range(1, hops_per_frame):
            p_k = jnp.dot(block, bases_block[k], preferred_element_type=jnp.float32)
            # Align hop i+k with frame i (roll requires non-negative shifts:
            # -k == rows - k). Wrapped rows land at local hop indices
            # >= n_hops - k >= n and are never read (frames stop at n-1).
            acc = acc + pltpu.roll(p_k, clip_tile * n_hops - k, 0)
        re = acc[:, :n_freqs]
        im = acc[:, n_freqs:]
        power = re * re + im * im
        mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
        logmel = jnp.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD
        out_ref[...] = logmel.reshape(clip_tile, n_hops, MEL_BINS)[:, :n, :]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((clip_tile, n_hops, _HOP_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hops_per_frame, _HOP_PAD, two_nf), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, MEL_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((clip_tile, n, MEL_BINS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_b, n, MEL_BINS), jnp.float32),
        interpret=interpret,
    )(hops, bases, fb)
    return out[:b]
