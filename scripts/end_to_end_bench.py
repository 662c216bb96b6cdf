#!/usr/bin/env python
"""
End-to-end `heybuddy train` wall-clock decomposition (VERDICT r2 next #4).

The north star (BASELINE.md:26-30) is finishing `heybuddy train "hey buddy"`
at the reference's default scale (100k positive + 100k adversarial clips,
25k validation, 3 stages) faster than the reference on an A100. This script
measures each stage at a configurable scale and extrapolates honestly:

  1. **TTS synthesis** (host): clips/s of the live backend, measured alone.
  2. **TTS -> augment -> featurize pipeline** (host + device, double-buffered):
     clips/s through `TrainingFeaturesGenerator.generate` — the production
     path; overlap means pipeline ~= max(TTS, device) per batch.
  3. **Featurize only** (device): clips/s of the fused kernel (bench.py's
     number) for reference.
  4. **Training steps** (device): steps/s of the jitted trainer at the
     reference's default batch composition (50 pos + 50 adv + 1000 neg).

Writes a JSON summary and (--md) an END_TO_END.md section with the
extrapolation to the reference default scale.

Run serially on an idle chip: `python scripts/end_to_end_bench.py --clips 512`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", type=int, default=512,
                   help="clips for the TTS/pipeline probes")
    p.add_argument("--train-steps", type=int, default=300)
    p.add_argument("--json", default=None)
    p.add_argument("--md", default=None, help="write END_TO_END.md here")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def time_tts(n: int, seed: int, backend: str = "formant",
             batch_size: int = 8) -> float:
    """Pure TTS clips/s through the production sample generator."""
    from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator

    gen = SpeechSampleGenerator(
        "hey buddy", batch_size=batch_size, seed=seed, tts_backend=backend
    )
    it = gen(n)
    # warm (phonemizer init, device compiles); not counted in the timed window
    for _ in range(batch_size):
        next(it)
    t0 = time.time()
    count = 0
    for _ in it:
        count += 1
    return count / (time.time() - t0)


def time_pipeline(n: int, seed: int, tmpdir: str,
                  backend: str = "formant", warm: int = 8) -> float:
    """TTS -> augment -> featurize -> shard store, the production path."""
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator
    from heybuddy_tpu.utils.npy import AppendableNpyFile

    gen = TrainingFeaturesGenerator(
        "hey buddy", directory=tmpdir, tts_backend=backend, seed=seed,
        use_cache=False,
    )
    store = AppendableNpyFile(
        os.path.join(tmpdir, f"e2e-probe-{backend}.npy"))
    # Warm the jitted augment+featurize programs. ``warm`` must cover one
    # FULL dispatch batch of the generator (512 on the fused device path):
    # an 8-clip warm run compiles only the 8-bucket program and the timed
    # window then pays the production program's compile + per-process load
    # (measured: 844 -> 98 clips/s when the warm-up misses the shape).
    gen.generate(warm, store=store, seed_offset=900000)
    t0 = time.time()
    written = gen.generate(n, store=store, seed_offset=0)
    dt = time.time() - t0
    return written / dt


def time_featurize(batch: int = 2048, iters: int = 10) -> float:
    """Device-only featurization clips/s on HBM-resident batches (bench.py's
    exact methodology; feeding numpy per call instead measures the axon
    tunnel's host->device transfer, ~400x slower than the compute)."""
    import jax

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.models.featurizer import featurize_batch

    params = embedding_net.default_params()
    rng = np.random.default_rng(0)
    audio = jax.device_put(
        rng.normal(0.0, 1000.0, (batch, CLIP_SAMPLES)).astype(np.float32)
    )
    fn = jax.jit(featurize_batch)

    def fetch(result):
        return float(np.asarray(result[0, 0, 0]))

    for _ in range(3):
        fetch(fn(params, audio))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(params, audio)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def time_training(steps: int, seed: int, tmpdir: str) -> float:
    """Jitted trainer steps/s at the reference default batch composition."""
    from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator
    from heybuddy_tpu.training.trainer import WakeWordTrainer

    rng = np.random.default_rng(seed)

    def fake(n):
        return PrecalculatedDatasetIterator(
            "e2e", data=rng.normal(0, 1, (n, 16, 96)).astype(np.float32), seed=seed
        )

    training = WakeWordTrainingDatasetIterator(
        num_batch_threads=1,
        positive=[(fake(2000), 50)],
        negative=[(fake(2000), 50), (fake(4000), 1000)],
    )
    trainer = WakeWordTrainer(checkpoint_dir=tmpdir, seed=seed)
    t0 = time.time()
    trainer.train_epoch(
        training, num_steps=steps, validation_steps=steps + 1,
        checkpoint_steps=steps + 1, logging_steps=max(steps // 3, 1),
        name="e2e-bench",
    )
    dt = time.time() - t0
    training.stop()
    return steps / dt


REF_SCALE = {
    "positive": 100_000,
    "adversarial": 100_000,
    "validation": 25_000,
    "testing": 50_000,
    "steps": 15_000,  # 3 stages x 5000 (constants.py:81-91)
}


def main() -> None:
    args = parse_args()
    os.environ.setdefault("HEYBUDDY_OFFLINE", "1")
    import tempfile

    import jax

    try:
        from heybuddy_tpu.utils.downloads import get_cache_dir

        jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    tmpdir = tempfile.mkdtemp(prefix="e2e-bench-")
    results = {}
    t_all = time.time()
    results["tts_clips_per_s"] = round(time_tts(args.clips, args.seed), 2)
    print(f"TTS (host): {results['tts_clips_per_s']} clips/s")
    results["tts_device_clips_per_s"] = round(
        time_tts(args.clips, args.seed, backend="formant-device",
                 batch_size=128), 2)
    print(f"TTS (formant-device): {results['tts_device_clips_per_s']} clips/s")
    results["pipeline_clips_per_s"] = round(
        time_pipeline(args.clips, args.seed, tmpdir), 2
    )
    print(f"pipeline (TTS+augment+featurize): {results['pipeline_clips_per_s']} clips/s")
    # The fused device path dispatches 512-clip batches; warm with one full
    # batch and time over enough clips to amortize the probe's fixed
    # per-generate costs (plan build, final drain, shard writes).
    results["pipeline_device_clips_per_s"] = round(
        time_pipeline(max(args.clips, 2048), args.seed, tmpdir,
                      backend="formant-device", warm=512), 2
    )
    print(
        "pipeline (device TTS): "
        f"{results['pipeline_device_clips_per_s']} clips/s")
    results["featurize_clips_per_s"] = round(time_featurize(), 0)
    print(f"featurize only (device): {results['featurize_clips_per_s']} clips/s")
    results["train_steps_per_s"] = round(
        time_training(args.train_steps, args.seed, tmpdir), 2
    )
    print(f"training (50+50+1000 batch): {results['train_steps_per_s']} steps/s")
    results["probe_wall_s"] = round(time.time() - t_all, 1)

    total_clips = sum(v for k, v in REF_SCALE.items() if k != "steps")
    best_pipeline = max(
        results["pipeline_clips_per_s"], results["pipeline_device_clips_per_s"])
    gen_s = total_clips / best_pipeline
    train_s = REF_SCALE["steps"] / results["train_steps_per_s"]
    results["extrapolated"] = {
        "total_clips": total_clips,
        "pipeline_clips_per_s": best_pipeline,
        "feature_generation_s": round(gen_s, 0),
        "training_s": round(train_s, 0),
        "end_to_end_s": round(gen_s + train_s, 0),
        "end_to_end_h": round((gen_s + train_s) / 3600.0, 2),
    }
    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    if args.md:
        write_md(args.md, results)


def write_md(path: str, r: dict) -> None:
    e = r["extrapolated"]
    body = f"""# END_TO_END — `heybuddy train` wall-clock (measured + extrapolated)

North star (BASELINE.md:26-30): finish `heybuddy train "hey buddy"` at the
reference's default scale — 100k positive + 100k adversarial + 25k validation
+ 50k testing TTS clips, 3 stages x 5,000 steps — faster than the reference
on an A100. Measured on one TPU v5e chip (axon tunnel) + one host core.

## Measured stage rates ({time.strftime('%Y-%m-%d')})

| Stage | Rate | Notes |
|---|---|---|
| TTS synthesis (host, formant) | {r['tts_clips_per_s']} clips/s | single host core, the host numpy renderer |
| TTS synthesis (formant-device) | {r['tts_device_clips_per_s']} clips/s | host plans, TPU renders (models/formant_device.py) |
| TTS -> augment -> featurize pipeline (host TTS) | {r['pipeline_clips_per_s']} clips/s | device work overlaps host TTS (double-buffered) |
| TTS -> augment -> featurize pipeline (device TTS) | {r['pipeline_device_clips_per_s']} clips/s | production path with the formant-device backend |
| featurize only (device) | {r['featurize_clips_per_s']:.0f} clips/s | fused Pallas path (bench.py) |
| training steps (50+50+1000 batch) | {r['train_steps_per_s']} steps/s | jitted masked-mining step |

## Extrapolation to the reference default scale

Using the best measured pipeline rate ({e['pipeline_clips_per_s']} clips/s):

| Phase | Time |
|---|---|
| feature generation ({e['total_clips']:,} clips) | {e['feature_generation_s']:.0f} s |
| training (15,000 steps) | {e['training_s']:.0f} s |
| **end-to-end** | **{e['end_to_end_s']:.0f} s ({e['end_to_end_h']} h)** |

With the host backend the pipeline is **host-bound**: the device featurizes
{r['featurize_clips_per_s']:.0f} clips/s while the host synthesizes
{r['tts_clips_per_s']} clips/s on its single core. The formant-device
backend moves the rendering FLOPs onto the chip — the host keeps only
phonemize/plan/track decimation — which is what the device-TTS rows measure.
Residual host work (planning, augment orchestration, shard writes) scales
with host cores on a multi-core production machine; a Piper/VITS checkpoint
running on-device would replace the planner entirely (the JAX VITS inference
stack is ready).

Reference comparison: the reference publishes no end-to-end numbers
(BASELINE.md). Its pipeline on an A100 pays GPU VITS TTS (its README
estimates dataset generation in hours at default scale) plus ~1k clips/s
featurization (estimated, embeddings.py:136-146 host window loops) plus
15k training steps with 12 batch threads. Our featurization alone holds a
~{r['featurize_clips_per_s']/1000:.0f}x margin over that estimate; the
end-to-end comparison rests on TTS hardware (1 host core here vs an A100
for VITS there), so the honest claim is the table above, not a single
speedup factor.
"""
    with open(path, "w") as f:
        f.write(body)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
