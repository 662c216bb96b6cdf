#!/usr/bin/env python
"""Cheap embedding-space probe: does a candidate embedding separate the wake
phrase from its swap-collision family better than the bundled one?

Round-5 motivation (QUALITY.md round 5): v25's residual FAR_adv sits on
swap-collision texts the HEAD was never trained on — evidence the frozen
embedding places each unseen collision close to the phrase. Before spending
a ~2 h campaign on a new embedding, this probe renders a few dozen clips of
the phrase and of held-out-style swap texts (single + double, seeded apart
from every training pool), mean-pools each clip's embedding features, and
reports:

* phrase<->phrase cosine (same text, different speakers) — invariance, keep HIGH;
* phrase<->swap cosine — the collision family, want LOW;
* the margin between them — the number the campaign bets on.

Usage:
    python scripts/embedding_separation_probe.py [--augment] [cand.npz ...]

With no args, probes only the bundled embedding. ~2 min per candidate on the
chip (one featurization dispatch per embedding). ``--augment`` additionally
routes every rendered clip through the production augmentation chain
(ops/augment.py defaults + synthetic noise/IRs) before featurizing — the
distribution FAR_adv is actually measured on. A margin that holds on clean
renders but collapses augmented means the confusion is acoustic (noise/
reverb masking), not representational, and a better embedding cannot buy it
back. Set JAX_PLATFORMS=cpu + jax.config (this script does) to run the
augment jit off-chip while a campaign owns the tunnel.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _render_pool(texts: list, per_text: int, seed: int) -> np.ndarray:
    from heybuddy_tpu.models.formant import FormantSynthesizer

    synth = FormantSynthesizer()
    rng = np.random.default_rng(seed)
    clips = []
    for text in texts:
        for k in range(per_text):
            audio = synth.synthesize(text, speaker=int(rng.integers(0, 200)))
            padded = np.zeros(23040, dtype=np.float32)
            padded[: min(len(audio), 23040)] = audio[:23040]
            clips.append(padded)
    return np.stack(clips)


def _pooled(weights: "str | None", audio: np.ndarray) -> np.ndarray:
    """(n, 23040) audio -> (n, 96) L2-normalized mean-pooled embeddings."""
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.models.featurizer import SpeechEmbeddings

    params = embedding_net.load_params(weights) if weights else None
    emb = SpeechEmbeddings(params=params)
    feats = np.asarray(emb(audio))  # (n, 16, 96)
    pooled = feats.mean(axis=1)
    return pooled / (np.linalg.norm(pooled, axis=1, keepdims=True) + 1e-9)


def _augment(audio: np.ndarray, seed: int = 5) -> np.ndarray:
    """Push int16-range clips through the production augment chain."""
    import jax

    from heybuddy_tpu.data.augmented import NoiseProvider
    from heybuddy_tpu.ops.augment import AugmentConfig, augment_batch

    cfg = AugmentConfig()
    noise = NoiseProvider(seed=seed)
    b, t = audio.shape
    lengths = np.full((b,), t, np.int32)
    key = jax.random.PRNGKey(seed)
    out = augment_batch(
        key,
        audio.astype(np.float32) / 32768.0,
        lengths,
        noise.noise_batch(b, t),
        noise.impulse_batch(b),
        cfg,
    )
    return np.asarray(out, np.float32) * 32768.0


def main() -> None:
    from heybuddy_tpu.text.adversarial import single_swap_collision_texts

    phrase = os.environ.get("HEYBUDDY_PROBE_PHRASE", "hey buddy")
    # Seed 31337 is shared by NO training pool (campaign seeds 0, offsets
    # 991/997; feature namespaces are multiples of 10M) — these swaps stand
    # in for the UNSEEN family the v25 attribution flagged.
    swaps = single_swap_collision_texts(
        phrase, num_samples=24, seed=31337, max_swaps=2
    )
    args = list(sys.argv[1:])
    augment = "--augment" in args
    if augment:
        args.remove("--augment")
        import jax

        # Run the augment/featurize jits off-chip so a live campaign keeps
        # the tunnel (first remote compile is 40-500 s anyway).
        jax.config.update("jax_platforms", "cpu")

    per_text = 4
    pos_audio = _render_pool([phrase], per_text * 12, seed=7)
    swap_audio = _render_pool(swaps, per_text, seed=11)
    if augment:
        pos_audio = _augment(pos_audio, seed=5)
        swap_audio = _augment(swap_audio, seed=6)

    candidates = [None] + args
    for cand in candidates:
        pos = _pooled(cand, pos_audio)
        neg = _pooled(cand, swap_audio)
        pp = pos @ pos.T
        iu = np.triu_indices_from(pp, k=1)
        phrase_phrase = float(pp[iu].mean())
        phrase_swap_all = pos @ neg.T
        phrase_swap = float(phrase_swap_all.mean())
        # the nearest swap is what the head's decision boundary fights
        phrase_swap_max = float(phrase_swap_all.max(axis=0).mean())
        name = cand or "bundled-default"
        print(
            f"{name}: phrase<->phrase {phrase_phrase:.4f}, "
            f"phrase<->swap mean {phrase_swap:.4f} / nearest {phrase_swap_max:.4f}, "
            f"margin {phrase_phrase - phrase_swap_max:.4f}"
        )


if __name__ == "__main__":
    main()
