#!/usr/bin/env python
"""
Attribute sliding-window stream false positives to the phrases under them.

Rebuilds the quality harness's streaming-eval audio (same seeds), scores every
runtime window position with a trained checkpoint, and prints — for each
above-threshold window — the phrase(s) whose rendered span overlaps the
window, plus the score. Distinguishes the two failure modes that look
identical in a bare fp/hour number:

  * SPECIFIC collisions: a handful of phrases account for most FPs (fix =
    adversarial/mined coverage of those phrases), vs
  * DIFFUSE overlap: FPs scatter across unrelated phrases (fix = a stronger
    embedding / classifier — feature space can't separate the classes).

Usage:
  python scripts/diagnose_stream_fps.py --checkpoint ckpt.npz \
      --embedding artifacts/embedding-v4.npz [--threshold 0.5] [--minutes 15]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--embedding", default=None)
    p.add_argument("--phrase", default="hey buddy")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--minutes", type=float, default=15.0)
    p.add_argument("--seed", type=int, default=31, help="stream seed (harness: args.seed + 31)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.embedding:
        os.environ["HEYBUDDY_EMBEDDING_WEIGHTS"] = os.path.abspath(args.embedding)
    os.environ.setdefault("HEYBUDDY_OFFLINE", "1")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the remote TPU compile of the featurizer is
    # 300-500 s per process without it (the quality harness sets the same).
    try:
        from heybuddy_tpu.utils.downloads import get_cache_dir

        jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.data.streams import (
        RUNTIME_WINDOW_STRIDE,
        stream_window_clips,
        stream_window_count,
        synth_speech_stream,
    )
    from heybuddy_tpu.models.featurizer import get_speech_embeddings
    from heybuddy_tpu.models.wakeword import WakeWordMLPModel

    # The SAME stream distribution training negatives/fp-per-hour use.
    stream, schedule = synth_speech_stream(
        args.minutes, args.seed, exclude_phrase=args.phrase,
        tts_backend="formant", return_schedule=True,
    )

    model = WakeWordMLPModel.from_file(args.checkpoint)
    emb = get_speech_embeddings()
    stride = RUNTIME_WINDOW_STRIDE
    n = stream_window_count(stream)
    scores = np.zeros(n, dtype=np.float32)
    # batch 1024 = the shape the quality harness compiles, so the persistent
    # cache is shared between the two tools
    for i in range(0, n, 1024):
        clips = stream_window_clips(stream, start=i, count=1024)
        f = np.asarray(emb(clips), dtype=np.float32)
        scores[i : i + len(clips)] = np.asarray(model(f)).reshape(-1)

    def covering(start: int, end: int):
        return [t for (s, e, t) in schedule if s < end and e > start]

    hits = np.flatnonzero(scores >= args.threshold)
    by_phrase: collections.Counter = collections.Counter()
    rows = []
    for idx in hits:
        s = int(idx) * stride
        phrases = covering(s, s + CLIP_SAMPLES)
        rows.append(
            {
                "t": round(s / 16000.0, 2),
                "score": round(float(scores[idx]), 4),
                "phrases": phrases,
            }
        )
        for ph in phrases:
            by_phrase[ph] += 1

    windows_per_hit = max(len(hits), 1)
    print(f"{len(hits)} above-threshold windows / {n} total "
          f"({args.minutes:.0f} min, thr={args.threshold})")
    print("\nTop phrases under FP windows:")
    for ph, c in by_phrase.most_common(15):
        print(f"  {c:4d}  {ph!r}")
    uniq = len(by_phrase)
    top3 = sum(c for _, c in by_phrase.most_common(3))
    total_attr = sum(by_phrase.values())
    print(f"\n{uniq} distinct phrases; top-3 cover "
          f"{top3}/{total_attr} attributions "
          f"({'SPECIFIC collisions' if total_attr and top3 / total_attr > 0.5 else 'DIFFUSE overlap'})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"hits": rows, "by_phrase": dict(by_phrase)}, f, indent=2)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
