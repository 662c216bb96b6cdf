#!/usr/bin/env python
"""
Probe: what does a bf16-input DFT cost in accuracy, and what does it buy in
speed, on the real chip?

Context (PERF.md): the production featurization pipeline is DFT-matmul-bound
(~12.7 TF/s effective on (768,160)x(160,256) f32 dots), and Mosaic already
computes f32 matmuls at silently reduced precision on hardware (measured
max |err| 3.9e-3 vs an exact f64 DFT — bf16-multipass-class). If a single
bf16 MXU pass keeps the scaled log-mel within the embedding trunk's own bf16
input quantization (~2e-2), it is numerically free for the feature contract
and up to ~3x faster on the DFT stage.

Accuracy: 16 realistic clips (formant TTS speech + noise) -> scaled log-mel
via exact f64 numpy, the XLA path, Pallas f32, Pallas bf16; plus the
end-to-end (16,96) feature deltas through the fused pipeline.

Timing: interleaved round-robin minima (shared-chip contention) over
mel-patches f32/bf16, embedding-from-patches, and the full fused pipeline
f32/bf16 at batch 2048.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.constants import CLIP_SAMPLES, MEL_HOP_LENGTH, MEL_LOG_EPS, MEL_SCALE_ADD, MEL_SCALE_DIV
from heybuddy_tpu.models import embedding_net
from heybuddy_tpu.ops.melspec import mel_spectrogram, num_frames
from heybuddy_tpu.ops.pallas.melspec_kernel import (
    _constants,
    mel_patches_pallas,
    mel_spectrogram_pallas,
)


def fetch(r):
    return float(np.asarray(r.reshape(-1)[0]))


def realistic_clips(n: int) -> np.ndarray:
    from heybuddy_tpu.models.formant import FormantSynthesizer

    synth = FormantSynthesizer()
    rng = np.random.default_rng(7)
    out = np.zeros((n, CLIP_SAMPLES), np.float32)
    for i in range(n):
        clip = synth.synthesize("hey buddy what is the weather", speaker=i % 12)
        k = min(len(clip), CLIP_SAMPLES)
        out[i, :k] = clip[:k]
        out[i] += rng.normal(0, 200.0, CLIP_SAMPLES)  # int16-range noise floor
    out *= 32768.0 / max(1.0, np.abs(out).max())  # full int16 range
    return out


def f64_logmel(audio: np.ndarray) -> np.ndarray:
    """Exact float64 reference of the kernel's math (same basis/filterbank)."""
    basis_blocks, hop_offsets, fb = _constants()
    hop = MEL_HOP_LENGTH
    b, t = audio.shape
    frames = num_frames(t)
    n_hops = frames + 3
    padded = np.zeros((b, n_hops * hop), np.float64)
    padded[:, : min(t, n_hops * hop)] = audio[:, : n_hops * hop]
    spec = np.zeros((b, frames, basis_blocks.shape[2]), np.float64)
    for idx, j in enumerate(hop_offsets):
        blk = basis_blocks[idx].astype(np.float64)
        for f in range(frames):
            seg = padded[:, (f + j) * hop : (f + j + 1) * hop]
            spec[:, f] += seg @ blk
    half = spec.shape[2] // 2
    power = spec[:, :, :half] ** 2 + spec[:, :, half:] ** 2
    mel = power @ fb.astype(np.float64)
    return (np.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD).astype(np.float64)


def accuracy() -> None:
    audio_np = realistic_clips(16)
    audio = jax.device_put(audio_np)
    ref = f64_logmel(audio_np)
    frames = ref.shape[1]

    def err(x, label):
        x = np.asarray(x, np.float64)[:, :frames]
        d = np.abs(x - ref)
        print(json.dumps({
            "probe": label,
            "max_abs_err": float(d.max()),
            "mean_abs_err": float(d.mean()),
            "p999_abs_err": float(np.quantile(d, 0.999)),
        }))

    err(mel_spectrogram(audio), "xla_melspec")
    err(mel_spectrogram_pallas(audio), "pallas_f32")
    err(mel_spectrogram_pallas(audio, dft_dtype=jnp.bfloat16), "pallas_bf16")

    # end-to-end feature deltas through the fused pipeline
    from heybuddy_tpu.models.featurizer import featurize_batch
    from heybuddy_tpu.ops.pallas.embedding_kernel import fused_embedding_from_patches
    from heybuddy_tpu.ops.windows import embedding_window_starts

    params = embedding_net.default_params()
    starts = embedding_window_starts(CLIP_SAMPLES)
    banded_f32 = np.asarray(
        featurize_batch(params, audio, pooling="banded", compute_dtype=jnp.float32)
    )

    def fused(dft_dtype):
        patches, np_ = mel_patches_pallas(audio, dft_dtype=dft_dtype)
        return np.asarray(
            fused_embedding_from_patches(params, patches, starts, np_)[: audio.shape[0]]
        )

    f32_feats = fused(jnp.float32)
    bf16_feats = fused(jnp.bfloat16)
    print(json.dumps({
        "probe": "features_fused_f32_vs_banded_f32",
        "max_abs": float(np.abs(f32_feats - banded_f32).max()),
    }))
    print(json.dumps({
        "probe": "features_fused_bf16dft_vs_banded_f32",
        "max_abs": float(np.abs(bf16_feats - banded_f32).max()),
    }))
    print(json.dumps({
        "probe": "features_bf16dft_vs_f32dft",
        "max_abs": float(np.abs(bf16_feats - f32_feats).max()),
        "mean_abs": float(np.abs(bf16_feats - f32_feats).mean()),
    }))


def timing(batch: int, iters: int, passes: int) -> None:
    from heybuddy_tpu.ops.pallas.embedding_kernel import fused_embedding_from_patches
    from heybuddy_tpu.ops.windows import embedding_window_starts

    params = embedding_net.default_params()
    starts = embedding_window_starts(CLIP_SAMPLES)
    key = jax.random.PRNGKey(0)
    audio = jax.random.normal(key, (batch, CLIP_SAMPLES), jnp.float32) * 1000.0
    patches0, np_ = mel_patches_pallas(audio)
    patches0 = jax.block_until_ready(patches0)

    variants = []

    def add(label, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.time()
        fetch(jfn(*args))
        print(f"compiled {label} in {time.time() - t0:.1f}s", flush=True)
        variants.append((label, jfn, args))

    add("mel_patches_f32", lambda a: mel_patches_pallas(a)[0], audio)
    add("mel_patches_bf16", lambda a: mel_patches_pallas(a, dft_dtype=jnp.bfloat16)[0], audio)
    add("emb_from_patches", lambda p, x: fused_embedding_from_patches(p, x, starts, np_), params, patches0)
    add("full_f32", lambda p, a: fused_embedding_from_patches(p, *(lambda r: (r[0],))(mel_patches_pallas(a)), starts, np_), params, audio)
    add("full_bf16", lambda p, a: fused_embedding_from_patches(p, mel_patches_pallas(a, dft_dtype=jnp.bfloat16)[0], starts, np_), params, audio)

    best = {label: float("inf") for label, _, _ in variants}
    for p in range(passes):
        for label, fn, args in variants:
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(*args)
            fetch(out)
            best[label] = min(best[label], (time.perf_counter() - t0) / iters)
        print(f"pass {p + 1}/{passes}: " + ", ".join(f"{l}={best[l]*1e3:.2f}ms" for l in best), flush=True)

    for label in best:
        print(json.dumps({
            "probe": label,
            "ms_per_batch": round(best[label] * 1e3, 3),
            "clips_per_s": round(batch / best[label], 0),
        }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--skip-accuracy", action="store_true")
    p.add_argument("--skip-timing", action="store_true")
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--passes", type=int, default=6)
    args = p.parse_args()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    if not args.skip_accuracy:
        accuracy()
    if not args.skip_timing:
        timing(args.batch, args.iters, args.passes)
