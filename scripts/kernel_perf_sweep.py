#!/usr/bin/env python
"""
Embedding-kernel cost attribution + tiling sweep (VERDICT r2 next #5).

PERF.md's open question: the fused embedding kernel runs at 4.5 ms / 2048
clips while its matmul+HBM floor is ~1.6 ms; the gap is attributed (by
estimation) to VPU work and per-grid-step overhead. This script MEASURES it:

  1. **Stage ablations** (clip_tile=16): re-time the kernel with each stage
     replaced by a cheap same-shape stand-in (softmax -> static band weights,
     grouped rms -> passthrough, trunk rms -> passthrough, gelu -> relu,
     posp -> skip). The timing delta is that stage's true cost.
  2. **Tile sweep**: clip_tile in {16, 32, 64} with the scoped-VMEM limit
     raised, measuring how much of the cost is per-grid-step overhead
     (128 -> 64 -> 32 steps for batch 2048).

Each variant is a distinct program: ~40-500 s remote compile on the axon
tunnel, so results append to a JSONL file as they land. Run on an idle chip:

    python scripts/kernel_perf_sweep.py --out /tmp/kernel_sweep.jsonl
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BATCH = 2048
ITERS = 10


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/kernel_sweep.jsonl")
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--skip-ablations", action="store_true")
    p.add_argument("--passes", type=int, default=8)
    p.add_argument("--tiles", default="16,32,64")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import jax

    try:
        from heybuddy_tpu.utils.downloads import get_cache_dir

        jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.ops.melspec import mel_spectrogram
    from heybuddy_tpu.ops.pallas.embedding_kernel import fused_embedding_windows
    from heybuddy_tpu.ops.windows import embedding_window_starts

    params = embedding_net.default_params()
    starts = embedding_window_starts(CLIP_SAMPLES)
    rng = np.random.default_rng(0)
    audio = rng.normal(0.0, 1000.0, (args.batch, CLIP_SAMPLES)).astype(np.float32)
    spec = jax.device_put(np.asarray(jax.jit(mel_spectrogram)(audio)))
    print(f"spec: {spec.shape} on {spec.devices()}")

    def fetch(r):
        return float(np.asarray(r[0, 0, 0]))

    # Build every variant first (compiles are cached), then time them in
    # INTERLEAVED round-robin passes taking the per-variant minimum: the
    # shared chip behind the axon tunnel has multi-ms contention spikes, so
    # sequential per-variant timing produces incoherent deltas (observed:
    # the same program timed 4.0 and 7.3 ms in back-to-back sweeps).
    variants: list[tuple[str, Any, dict]] = []

    def add(label, **kw):
        fn = jax.jit(lambda p, s: fused_embedding_windows(p, s, starts, **kw))
        t0 = time.time()
        fetch(fn(params, spec))
        print(f"compiled {label} in {time.time() - t0:.1f}s")
        variants.append((label, fn, kw))

    add("baseline_t16")
    if not args.skip_ablations:
        for stage in (
            "softmax", "pool_rms", "trunk_rms", "gelu", "posp",
            "trunk", "pool_mm", "head_mm", "noop",
        ):
            add(f"ablate_{stage}", ablate=frozenset({stage}))
        add("ablate_all_vpu", ablate=frozenset({"softmax", "pool_rms", "trunk_rms", "gelu"}))
        add(
            "ablate_all_mm_but_trunk",
            ablate=frozenset({"softmax", "pool_mm", "posp", "head_mm"}),
        )
    for t in (int(x) for x in args.tiles.split(",") if x):
        if t != 16:
            add(f"tile_{t}", clip_tile=t, vmem_limit_bytes=64 * 1024 * 1024)

    best = {label: float("inf") for label, _, _ in variants}
    for pass_i in range(args.passes):
        for label, fn, _ in variants:
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                out = fn(params, spec)
            fetch(out)
            best[label] = min(best[label], (time.perf_counter() - t0) / ITERS)
        print(f"pass {pass_i + 1}/{args.passes}: "
              + ", ".join(f"{l}={best[l] * 1e3:.2f}" for l, _, _ in variants[:3]))

    results = []
    with open(args.out, "a") as f:
        for label, _, kw in variants:
            row = {
                "label": label,
                "ms_per_batch": round(best[label] * 1e3, 3),
                "clips_per_s": round(args.batch / best[label], 0),
                **{k: (sorted(v) if isinstance(v, frozenset) else v) for k, v in kw.items()},
            }
            results.append(row)
            f.write(json.dumps(row) + "\n")

    base_ms = results[0]["ms_per_batch"]
    print("\n=== summary (min over interleaved passes) ===")
    for r in sorted(results, key=lambda r: r["ms_per_batch"]):
        print(
            f"{r['label']:>24}: {r['ms_per_batch']:7.3f} ms  "
            f"{r['clips_per_s']:9.0f} clips/s  (delta {base_ms - r['ms_per_batch']:+.3f})"
        )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
