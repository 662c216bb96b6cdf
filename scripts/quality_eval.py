#!/usr/bin/env python
"""
End-to-end offline quality evaluation: FRR / FAR / FP-per-hour.

Reproducible harness behind QUALITY.md. Trains a wake-word classifier with
the framework's own pipeline (TTS -> augment -> featurize -> jitted trainer,
including sliding-offset partial-view hard negatives) and reports:

  - FRR               held-out augmented positives scored < threshold
  - FAR (adversarial) held-out phonetic near-collisions scored >= threshold
  - FAR (speech)      held-out ordinary-speech clips scored >= threshold
  - fp_per_hour       detections on >= 1 h of synthetic CONTINUOUS ordinary
                      speech via the runtime's sliding window (1.44 s window,
                      0.12 s stride, 1.92 s debounce) — the reference's own
                      operating metric (reference trainer.py:511-536, target
                      1.5/hr, constants.py:85)
  - sliding-offset max scores for the wake phrase and known near-collisions
    ("hay bunny" etc.), each embedded at random offsets in context audio

Usage:
  python scripts/quality_eval.py --embedding <weights.npz> --out results.json
  python scripts/quality_eval.py --quick            # tiny smoke version

The embedding weights flow through HEYBUDDY_EMBEDDING_WEIGHTS so cached
feature shards regenerate against the right feature space automatically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--phrase", default="hey buddy")
    p.add_argument("--embedding", default=None, help="embedding weights .npz")
    p.add_argument("--dataset-dir", default=None, help="feature cache dir (default: temp)")
    p.add_argument("--checkpoint-dir", default=None, help="classifier checkpoint dir")
    p.add_argument("--out", default=None, help="write the JSON summary here")
    p.add_argument("--quick", action="store_true", help="tiny sizes (smoke test)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-samples", type=int, default=800)
    p.add_argument("--heldout-samples", type=int, default=200)
    p.add_argument("--partial-samples", type=int, default=400)
    p.add_argument("--stream-samples", type=int, default=800,
                   help="sliding-window stream negatives (speech; half as many adversarial)")
    p.add_argument("--val-stream-samples", type=int, default=1600,
                   help="validation stream windows for the negative-weight "
                        "controller (1600 ~= 3.2 min; rare FPs need more)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--layers", type=int, default=2, help="classifier MLP blocks")
    p.add_argument("--layer-dim", type=int, default=96, help="classifier hidden dim")
    p.add_argument("--stream-minutes", type=float, default=60.0,
                   help="length of EACH fp/hour stream")
    p.add_argument("--stream-seeds", type=int, default=3,
                   help="independent fp/hour streams (the metric has ~10x "
                        "seed noise at 1 h; a bare single-stream point "
                        "estimate is never reported alone)")
    p.add_argument("--sliding-clips", type=int, default=20,
                   help="renderings for the headline sliding-gate recall")
    p.add_argument("--no-snr-buckets", action="store_true",
                   help="skip the FRR-by-SNR/reverb breakdown")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--validation-consecutive", type=int, default=2,
                   help="consecutive-window gate for the trainer's stream "
                        "validation negatives (matches the shipped runtime "
                        "gate the headline metrics are measured at)")
    p.add_argument("--select-runs", type=int, default=1,
                   help="train-K-select-on-validation: train this many "
                        "candidates (different trainer init + mining stream "
                        "seeds), score each on SELECTION data disjoint from "
                        "the report sets (a dedicated speech stream, a "
                        "dedicated adversarial clip set, and the controller's "
                        "clean-offset validation positives), and report "
                        "held-out metrics only for the winner. The mining "
                        "loop's run-to-run variance straddles the FAR/fp-hr "
                        "targets (QUALITY.md controller study); selection is "
                        "the honest way to pick an operating artifact.")
    p.add_argument("--select-stream-minutes", type=float, default=15.0,
                   help="length of the selection fp/hr stream per candidate")
    p.add_argument("--select-consolidate", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="after the K candidates, train one more model on the "
                        "UNION of all candidates' mined hard negatives and "
                        "let it compete on the selection data (independent "
                        "mining trajectories harvest different failure "
                        "modes; the union uses all of them)")
    p.add_argument("--select-adversarial-samples", type=int, default=400,
                   help="size of the selection adversarial clip set. 400 "
                        "clips put the 0.05 FAR target at ~+-1 sigma of the "
                        "observed candidate spread (binomial sigma 0.011 at "
                        "p=0.05), which is what lets selection rank "
                        "candidates whose true FAR differs by ~0.02")
    p.add_argument("--fixed-negative-weight", type=float, default=None,
                   help="disable the dynamic negative-weight controller and "
                        "train with this constant weight on all negatives. "
                        "The pre-gate-aware controller always saturated (raw "
                        "window counting could never hit the fp/hr target), "
                        "so the round-3 shipped config effectively trained "
                        "this way; the knob reproduces that regime honestly "
                        "under the corrected counting.")
    p.add_argument("--mine-rounds", type=int, default=2,
                   help="hard-negative mining rounds (stream -> harvest FPs -> retrain)")
    p.add_argument("--mine-floor", type=float, default=0.2,
                   help="mine windows scoring at or above this")
    p.add_argument("--adversarial-phrases", type=int, default=60,
                   help="TRAINING adversarial phrase-pool size (held-out pool "
                        "stays at 60 for cross-config comparability; pools are "
                        "seed-disjoint either way)")
    p.add_argument("--prefix-negatives", type=int, default=0,
                   help="N>0 adds N auto-derived PREFIX-negative texts (the "
                        "wake phrase's exact onset continuing into non-target "
                        "words, e.g. 'hey budget ...') to the TRAINING "
                        "adversarial pool. Targets onset false fires: the "
                        "'hey but' sliding residual and the stream-window "
                        "fp/hour tail. Held-out pools never include them.")
    p.add_argument("--reverb-positives", type=int, default=0,
                   help="N>0 adds N REVERB-MODE positives (guaranteed reverb "
                        "+ mid-SNR noise, no other distortion — the exact "
                        "distribution of the FRR-by-SNR reverb buckets) as "
                        "dedicated positive coverage. Targets the 0.21-0.31 "
                        "mid-SNR reverb FRR residual.")
    p.add_argument("--collision-negatives", type=int, default=0,
                   help="N>0 adds N SINGLE-SWAP collision texts (exactly one "
                        "word of the phrase replaced by a phonetic neighbor: "
                        "'hate buddy', 'hey buddies') to the TRAINING "
                        "adversarial pool. Targets the round-4 FAR_adv "
                        "attribution class; exact held-out texts are "
                        "excluded so the emphasis can't train on the "
                        "measured set.")
    p.add_argument("--collision-swap-depth", type=int, default=1,
                   help="Maximum words swapped per collision-negative text "
                        "(passed to single_swap_collision_texts max_swaps). "
                        "2 interleaves double swaps ('hate buddies', 'hate "
                        "bully') with the singles — the class the v25 "
                        "attribution moved the residual FAR mass to once "
                        "single swaps were trained (QUALITY.md round 5).")
    p.add_argument("--reverb-collisions", type=int, default=0,
                   help="N>0 renders N REVERB-ONLY collision negatives "
                        "(guaranteed reverb + mid-SNR noise, no other "
                        "distortion) of the swap-collision emphasis texts — "
                        "the mirror of --reverb-positives for the negative "
                        "class. Motivated by the shipped-v26 FAR-by-SNR "
                        "table: no-reverb FAR on the unseen swap family is "
                        "0.000 at every positive SNR while +reverb fires "
                        "0.10-0.23 at ALL SNRs (QUALITY.md round 5 cont.). "
                        "Uses the --collision-negatives text pool (or "
                        "derives one with the same held-out exclusion).")
    p.add_argument("--mine-adversarial-clips", type=int, default=0,
                   metavar="N",
                   help="N>0 renders N fresh augmented ADVERSARIAL CLIPS per "
                        "mining round (fresh text pool per round, disjoint "
                        "seeds from every held-out cache) and harvests "
                        "those scoring >= --mine-floor as negatives — the "
                        "clip-metric mirror of stream-FP mining. Stream "
                        "mining alone never touches the distribution "
                        "FAR_adv is measured on (augmented full-view "
                        "near-collisions).")
    p.add_argument("--hard-pair-boost", type=int, default=0,
                   help="N>0 adds the wake phrase's closest single-word "
                        "phonetic neighbors (auto-derived from the lexicon) "
                        "to the TRAINING adversarial pool, each duplicated N "
                        "times for rendering depth. Breadth (the generated "
                        "pool) is unaffected; held-out pools never include "
                        "them. v10-vs-v11 measured the tradeoff: breadth "
                        "fixes FAR_adv generalization, depth fixes gate "
                        "separation of minimal pairs.")
    p.add_argument("--collision-streams", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="add collision-salad stream windows (near-collision "
                        "words inside word salads - the diagnosed residual "
                        "stream-FP surface) to training negatives and mining")
    p.add_argument("--far-attribution", type=int, default=0, metavar="N",
                   help="with N>0, additionally report per-text FAR over N "
                        "fresh augmented renderings of each held-out "
                        "adversarial text (which texts carry the FAR tail)")
    p.add_argument("--calibration-seeds", type=int, default=2,
                   help="independent CALIBRATION streams (each --stream-minutes "
                        "long, seed-disjoint from the measurement streams) used "
                        "only to pick the deployed per-head threshold; all "
                        "targets are then re-evaluated at that threshold on "
                        "held-out data (the browser runtime ships calibrated "
                        "per-head thresholds, reference models/wake-word.ts)")
    p.add_argument("--eval-only", default=None, metavar="CKPT",
                   help="skip training/mining and re-score this checkpoint "
                        "(.npz); with a warm --dataset-dir and cached streams "
                        "this re-measures a config in minutes")
    return p.parse_args()


ADVERSARIAL_SLIDING_PHRASES = [
    "hay bunny",
    "say study",
    "hey bunny",
    "a buddy",
    "hey but",
    "hey budget meeting",
    "good morning",
    "hello there",
    "turn on the lights",
    "play some music",
]


def _pipeline_clips(text: str, n: int, seed: int):
    """Render ``text`` through the SAME TTS pipeline training uses (settings
    grid, speaker sampling) — direct low-level synthesizer calls produce
    out-of-distribution audio that measures renderer mismatch, not the model."""
    from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator

    gen = SpeechSampleGenerator(
        text, batch_size=min(n, 8), seed=seed, tts_backend="formant",
        phrase_augment_prob=0.0,
    )
    clips = []
    for sample in gen(n):
        arr = np.asarray(sample["audio"]["array"], dtype=np.float32)
        if np.abs(arr).max() > 4.0:  # int16-scale PCM
            arr = arr / 32768.0
        clips.append(arr)
    return clips


def _sliding_context(clip: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Embed a rendered clip in silence at a random stream offset, with
    context on BOTH sides (deployment is a continuous stream): with no
    trailing room, placements in the last ~0.5 s leave fewer than 2 windows
    fully containing the phrase and the consecutive gate CANNOT fire — 7 of
    20 draws were geometrically impossible, understating every config's
    recall (~0.65 measured vs 1.00 on valid placements, v10)."""
    from heybuddy_tpu.data.streams import RUNTIME_WINDOW_STRIDE

    lead = 2 * 16000
    trail = 24000
    ctx = np.zeros(lead + len(clip) + trail, dtype=np.float32)
    off = int(rng.integers(2 * RUNTIME_WINDOW_STRIDE, lead))
    ctx[off : off + len(clip)] = clip
    return ctx


_STREAM_CACHE_DIR: str = ""


def _stream_content_tag() -> str:
    """Hash of everything that determines stream CONTENT beyond the
    synthesizer versions: the wordlist (speech-stream vocabulary), the
    phonemizer backend, and the adversarial lexicon source. Round 4 added 4
    words to the bundled wordlist without bumping any version — every later
    run silently loaded pre-change cached streams, and fresh diagnostics
    synthesized different audio than the reports measured. Content must be
    part of the key. The g2p/lexicon terms mirror ``tts_provenance``
    (data/space.py): synthesis routes through ``get_phonemizer()`` and the
    adversarial vocabulary depends on CMUdict availability, so switching
    either would otherwise silently reuse streams rendered under the old
    backend. Defaults (simple g2p, builtin lexicon) contribute nothing so
    pre-existing caches stay keyed identically."""
    import hashlib

    from heybuddy_tpu.text.phonemizer import get_phonemizer, load_cmudict
    from heybuddy_tpu.text.wordlist import WORDS

    payload = ",".join(sorted(set(WORDS)))
    g2p = getattr(get_phonemizer(), "name", "simple")
    if g2p != "simple":
        payload += f"|g2p:{g2p}"
    if load_cmudict() is not None:
        payload += "|lex:cmu"
    return hashlib.md5(payload.encode()).hexdigest()[:8]


def _cached_stream(kind: str, minutes: float, seed: int, build) -> np.ndarray:
    """Disk-cache rendered stream waveforms: host-side synthesis dominates
    multi-hour fp/hour measurement, and the waveforms are embedding-agnostic
    so they are reusable across configs/embeddings/rounds (VERDICT r2 #3).
    Keyed on the formant/sampling versions AND the stream-content hash."""
    from heybuddy_tpu.models.formant import FORMANT_VERSION
    from heybuddy_tpu.models.tts import SAMPLING_VERSION

    if not _STREAM_CACHE_DIR:
        return build()
    os.makedirs(_STREAM_CACHE_DIR, exist_ok=True)
    path = os.path.join(
        _STREAM_CACHE_DIR,
        f"{kind}-v{FORMANT_VERSION}.{SAMPLING_VERSION}"
        f"-w{_stream_content_tag()}-{minutes:g}m-{seed}.npy",
    )
    if os.path.exists(path):
        return np.load(path)
    stream = build()
    np.save(path, stream.astype(np.float32))
    return stream


def synth_speech_stream(minutes: float, seed: int, exclude_phrase: str = ""):
    """Continuous ordinary speech (framework data/streams.py, formant TTS)."""
    from heybuddy_tpu.data.streams import synth_speech_stream as _synth

    return _cached_stream(
        f"speech-x{exclude_phrase.replace(' ', '-')}", minutes, seed,
        lambda: _synth(minutes, seed, exclude_phrase=exclude_phrase,
                       tts_backend="formant"),
    )


def derive_hard_pairs(phrase: str) -> list:
    """The phrase's closest single-word phonetic substitutions, auto-derived:
    for each word, the lexicon neighbors with the highest wildcard-match
    multiplicity (= fewest phone edits) swapped into the phrase."""
    import collections

    from heybuddy_tpu.text.adversarial import get_adversarial_text_generator

    g = get_adversarial_text_generator()
    words = phrase.split()
    pairs = []
    for i, w in enumerate(words):
        counts = collections.Counter(g.adversarial_words(w))
        top = counts.most_common()
        if not top:
            continue
        best = top[0][1]
        closest = [cand for cand, n in top if n == best][:8]
        for cand in closest:
            text = " ".join(words[:i] + [cand] + words[i + 1 :])
            if text != phrase:
                pairs.append(text)
    return sorted(set(pairs))


def synth_adversarial_stream(phrase: str, minutes: float, seed: int):
    """Continuous phonetic near-collisions (framework data/streams.py)."""
    from heybuddy_tpu.data.streams import synth_adversarial_stream as _synth

    return _cached_stream(
        f"adv-{phrase.replace(' ', '-')}", minutes, seed,
        lambda: _synth(phrase, minutes, seed, tts_backend="formant"),
    )


def synth_collision_stream(phrase: str, minutes: float, seed: int):
    """Near-collision words embedded in word salads (data/streams.py)."""
    from heybuddy_tpu.data.streams import synth_collision_salad_stream as _synth

    return _cached_stream(
        f"collision-{phrase.replace(' ', '-')}", minutes, seed,
        lambda: _synth(phrase, minutes, seed, tts_backend="formant"),
    )


def sliding_features_scores(model, stream: np.ndarray, batch: int = 1024,
                            with_features: bool = True):
    """(features, scores) for every sliding window position over the stream,
    using the runtime window geometry shared in data/streams.py.

    ``with_features=True`` keeps the (16, 96) inputs so mining can reuse the
    exact features the classifier saw; the non-mining callers pass False to
    skip the ~184 MB/hour-of-stream allocation.
    """
    from heybuddy_tpu.data.streams import stream_window_clips, stream_window_count
    from heybuddy_tpu.models.featurizer import get_speech_embeddings

    emb = get_speech_embeddings()
    n = stream_window_count(stream)
    feats = np.zeros((n, 16, 96), dtype=np.float32) if with_features else None
    scores = np.zeros(n, dtype=np.float32)
    for i in range(0, n, batch):
        clips = stream_window_clips(stream, start=i, count=batch)
        f = np.asarray(emb(clips), dtype=np.float32)
        if feats is not None:
            feats[i : i + len(f)] = f
        scores[i : i + len(f)] = np.asarray(model(f)).reshape(-1)
    return feats, scores


def sliding_scores(model, stream: np.ndarray, batch: int = 1024) -> np.ndarray:
    """Classifier score for every sliding window position over the stream."""
    return sliding_features_scores(model, stream, batch, with_features=False)[1]


def operating_threshold(score_runs, hours: float,
                        target_per_hour: float = 1.5,
                        consecutive: int = 1) -> float:
    """Smallest grid threshold whose debounced detection rate meets the
    reference's operating target (constants.py:85, 1.5 false wakes/hour),
    aggregated over ALL independent stream runs (``hours`` is their total).
    The grid extends into the sigmoid-saturated tail (0.995-0.9999): a
    well-separated model's positive scores sit above it."""
    if isinstance(score_runs, np.ndarray):
        score_runs = [score_runs]
    grid = np.concatenate(
        [np.arange(0.5, 1.0, 0.01), [0.995, 0.998, 0.999, 0.9995, 0.9999]]
    )
    for thr in grid:
        rate = sum(
            count_detections(s, float(thr), consecutive=consecutive)
            for s in score_runs
        )
        if rate / max(hours, 1e-9) <= target_per_hour:
            # np.arange grid values carry float noise (0.5700000000000003);
            # round so results JSON records clean thresholds.
            return float(round(thr, 4))
    return 1.0


def count_detections(scores: np.ndarray, threshold: float, consecutive: int = 1,
                     debounce_windows: int = 16) -> int:
    """Hits with the runtime's gate (refractory ~1.92 s debounce, optional
    consecutive-window requirement — runtime/detection.py)."""
    from heybuddy_tpu.runtime.detection import count_detections as _count

    return _count(scores, threshold, consecutive=consecutive,
                  debounce_windows=debounce_windows)


def wilson_interval(k: int, n: int, z: float = 1.96) -> list:
    """95% Wilson score interval for a binomial rate ``k/n``.

    Every headline rate is an estimate from a finite rendering sample; the
    run-to-run variance study (QUALITY.md) showed decisions made on point
    estimates alone straddle the targets, so the harness reports the interval
    next to every rate it prints.
    """
    if n <= 0:
        return [0.0, 1.0]
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return [round(float(max(center - half, 0.0)), 4),
            round(float(min(center + half, 1.0)), 4)]


def poisson_rate_interval(k: int, hours: float) -> list:
    """Exact (Garwood) 95% CI for a Poisson rate: ``k`` events / ``hours``.

    This models gated detections as homogeneous Poisson counting noise, so it
    is a *sampling-noise floor*: the controller study (QUALITY.md) shows
    between-run overdispersion (different mined negatives -> different model)
    well beyond it. Read it together with the per-run rates
    (``fp_per_hour_runs_c2``), which carry the honest between-run spread.
    """
    from scipy.stats import chi2

    if hours <= 0:
        return [0.0, float("inf")]
    lo = 0.0 if k == 0 else float(chi2.ppf(0.025, 2 * k) / 2.0)
    hi = float(chi2.ppf(0.975, 2 * k + 2) / 2.0)
    return [round(lo / hours, 3), round(hi / hours, 3)]


def selection_key(det2: int, sel_hours: float, sel_far: float,
                  sel_frr_off: float, sel_recall: float = 1.0) -> tuple:
    """Rank a selection candidate; lower tuples win.

    Returns ``(key_tuple, fp2, fp2_upper, penalty)``. Three campaign lessons
    are encoded here (QUALITY.md "Round 4" + round-4 tail):

    - Recall gates lexicographically FIRST: v23 won selection while dropping
      a detection (the program's first sub-1.0 recall, 39/40) because
      nothing in the key priced a missed wake. A candidate that fires the
      gate on every selection rendering of the phrase outranks any candidate
      that misses one, regardless of FAR or stream draw.

    - Selection streams are short (1-2 h), so the gated-rate point estimate
      cannot resolve rates near the 1.5/hr target: a true-3/hr candidate
      shows ZERO selection detections ~5% of the time, and the K-way
      minimum picks exactly those lucky draws (the v21 consolidated winner
      measured 0.0 at selection, 1.8 on the report streams). The graded
      penalty therefore prices the ~97.5% Poisson upper bound of the rate
      (rule of three at zero: 0 seen in 2 h still carries 1.5/hr).
    - FAR is the best-resolved selection metric (hundreds of clips,
      +-0.02), so a candidate over the 0.05 target there must never be
      rescued by stream luck: the FAR gate ranks lexicographically ahead
      of the graded penalty.
    """
    fp2 = det2 / sel_hours
    fp2_upper = float((det2 + 1.96 * np.sqrt(det2) + 3.0) / sel_hours)
    pen = (
        max(0.0, sel_far - 0.05) * 20.0
        + max(0.0, sel_frr_off - 0.05) * 20.0
        + max(0.0, fp2_upper - 1.5)
    )
    key = (
        0 if sel_recall >= 1.0 else 1,
        0 if sel_far <= 0.05 else 1,
        pen,
        sel_far + 0.1 * fp2,
    )
    return key, fp2, fp2_upper, pen


def operating_point_warnings(threshold: float, frr: float, hours: float,
                             target_per_hour: float = 1.5) -> list:
    """Degeneracy checks for a calibrated/operating threshold block.

    v24b (reports/quality-v24b-fixedweight-probe.json) shipped
    ``operating_frr: 1.0`` without a flag: ``operating_threshold`` exhausted
    its grid (returned 1.0) because the streams ran too hot for ANY
    threshold to meet the target, and every single-window metric computed at
    that threshold was meaningless. The gate-aware validation counter got a
    can't-resolve guard in round 3; this is the same guard for the
    calibration/operating path. Returns a list of human-readable warnings —
    empty means the block is interpretable."""
    warnings = []
    if hours * target_per_hour < 1.0:
        warnings.append(
            f"{hours:g} stream-hours cannot resolve {target_per_hour:g}/hr "
            f"(need >= {1.0 / target_per_hour:.2f} h for one expected event)"
        )
    if threshold >= 0.9999:
        warnings.append(
            f"threshold {threshold:g} is at the grid ceiling: no threshold "
            "met the target rate on these streams; metrics at this "
            "threshold are degenerate"
        )
    if frr >= 0.99:
        warnings.append(
            f"FRR {frr:g} at this threshold: the threshold sits above the "
            "positive score mass; recall metrics are meaningless here"
        )
    return warnings


def frr_by_snr_buckets(model, phrase: str, seed: int, thr: float,
                       n_clips: int = 48) -> dict:
    """FRR on positives augmented at PINNED background-noise SNR buckets,
    with and without reverb: the shipped sweeps park augmented-positive FRR
    at 0.25-0.36 with the explanation "the misses are inaudible-SNR clips" —
    this measures whether they actually concentrate in the low-SNR tail."""
    import jax

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.data.augmented import NoiseProvider
    from heybuddy_tpu.models.featurizer import get_speech_embeddings
    from heybuddy_tpu.ops.augment import AugmentConfig, augment_batch

    clips = _pipeline_clips(phrase, n_clips, seed=seed + 901)
    audio = np.zeros((len(clips), CLIP_SAMPLES), dtype=np.float32)
    lengths = np.zeros((len(clips),), dtype=np.int32)
    for i, c in enumerate(clips):
        n = min(len(c), CLIP_SAMPLES)
        audio[i, :n] = c[:n]
        lengths[i] = n

    provider = NoiseProvider(seed=seed, use_remote=True)
    noise = provider.noise_batch(len(clips))
    impulse = provider.impulse_batch(len(clips))
    emb = get_speech_embeddings()

    out = {}
    buckets = [(-10, -5), (-5, 0), (0, 5), (5, 10), (10, 20)]
    for reverb in (0.0, 1.0):
        for lo, hi in buckets:
            cfg = AugmentConfig(
                background_noise_prob=1.0,
                background_noise_min_snr_db=float(lo),
                background_noise_max_snr_db=float(hi),
                reverb_prob=reverb,
                # isolate the SNR/reverb axes: no EQ/distortion/pitch draws
                seven_band_prob=0.0, tanh_distortion_prob=0.0,
                pitch_shift_prob=0.0, band_stop_prob=0.0,
                colored_noise_prob=0.0, gain_prob=0.0,
            )
            key = jax.random.PRNGKey(seed + 7 * lo + int(reverb))
            aug = np.asarray(
                augment_batch(key, audio, lengths, noise, impulse, cfg)
            )
            scores = np.asarray(model(np.asarray(emb(aug), np.float32))).reshape(-1)
            tag = f"snr[{lo},{hi})dB" + ("+reverb" if reverb else "")
            out[tag] = round(float(np.mean(scores < thr)), 3)
    return out


def far_by_snr_buckets(model, phrase: str, seed: int, thr: float,
                       n_clips: int = 48) -> dict:
    """FAR on SWAP-COLLISION texts augmented at PINNED SNR buckets — the
    acoustic-confusion diagnostic for the round-5 residual.

    v25/v26 evidence (QUALITY.md round 5): the residual FAR_adv is
    saturated, diffuse, and immune to both head-level emphasis and an
    embedding with a 53% larger clean-render margin; the augmented
    separation probe shows the nearest augmented swap render sits CLOSER to
    the phrase cluster than phrase renders sit to each other. This measures
    where the false accepts live on the SNR/reverb axes: a clean top bucket
    with the mass in the masked tail means the misses are
    acoustically-confusable renders (a product envelope question), while a
    flat profile means boundary placement (a trainable gap). Texts are the
    seed-31337 unseen swap family (disjoint from every training pool), depth
    <= 2 — the class the v25 attribution named."""
    import jax

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.data.augmented import NoiseProvider
    from heybuddy_tpu.models.featurizer import get_speech_embeddings
    from heybuddy_tpu.ops.augment import AugmentConfig, augment_batch
    from heybuddy_tpu.text.adversarial import single_swap_collision_texts

    swaps = single_swap_collision_texts(
        phrase, num_samples=12, seed=31337, max_swaps=2
    )
    per_text = max(n_clips // max(len(swaps), 1), 1)
    clips = []
    for j, text in enumerate(swaps):
        clips.extend(_pipeline_clips(text, per_text, seed=seed + 903 + 13 * j))
    audio = np.zeros((len(clips), CLIP_SAMPLES), dtype=np.float32)
    lengths = np.zeros((len(clips),), dtype=np.int32)
    for i, c in enumerate(clips):
        n = min(len(c), CLIP_SAMPLES)
        audio[i, :n] = c[:n]
        lengths[i] = n

    provider = NoiseProvider(seed=seed, use_remote=True)
    noise = provider.noise_batch(len(clips))
    impulse = provider.impulse_batch(len(clips))
    emb = get_speech_embeddings()

    out = {}
    buckets = [(-10, -5), (-5, 0), (0, 5), (5, 10), (10, 20)]
    for reverb in (0.0, 1.0):
        for lo, hi in buckets:
            cfg = AugmentConfig(
                background_noise_prob=1.0,
                background_noise_min_snr_db=float(lo),
                background_noise_max_snr_db=float(hi),
                reverb_prob=reverb,
                # isolate the SNR/reverb axes: no EQ/distortion/pitch draws
                seven_band_prob=0.0, tanh_distortion_prob=0.0,
                pitch_shift_prob=0.0, band_stop_prob=0.0,
                colored_noise_prob=0.0, gain_prob=0.0,
            )
            key = jax.random.PRNGKey(seed + 7 * lo + int(reverb) + 31)
            aug = np.asarray(
                augment_batch(key, audio, lengths, noise, impulse, cfg)
            )
            scores = np.asarray(model(np.asarray(emb(aug), np.float32))).reshape(-1)
            tag = f"snr[{lo},{hi})dB" + ("+reverb" if reverb else "")
            out[tag] = round(float(np.mean(scores >= thr)), 3)
    return out


def far_attribution(model, texts: list, seed: int, thr: float,
                    per_text: int = 24) -> dict:
    """Per-text FAR over fresh augmented renderings of each adversarial text.

    The held-out FAR_adv is a single pooled rate; this resolves WHICH texts
    carry the tail (the stream-FP diagnosis's analog for the clip metric).
    Specific texts -> extend hard-negative emphasis; a flat profile -> the
    feature space can't separate the classes (embedding work, not data).

    Renders per_text clips per text through the training TTS grid, augments
    each text's batch with the DEFAULT augment chain (one draw per text so
    the per-text rate isn't confounded by a shared noise draw), and scores.
    """
    import jax

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.data.augmented import NoiseProvider
    from heybuddy_tpu.models.featurizer import get_speech_embeddings
    from heybuddy_tpu.ops.augment import AugmentConfig, augment_batch

    emb = get_speech_embeddings()
    provider = NoiseProvider(seed=seed + 3, use_remote=True)
    cfg = AugmentConfig()
    rates = {}
    for t_i, text in enumerate(sorted(texts)):
        clips = _pipeline_clips(text, per_text, seed=seed + 977 * t_i + 5)
        audio = np.zeros((len(clips), CLIP_SAMPLES), dtype=np.float32)
        lengths = np.zeros((len(clips),), dtype=np.int32)
        for i, c in enumerate(clips):
            n = min(len(c), CLIP_SAMPLES)
            audio[i, :n] = c[:n]
            lengths[i] = n
        noise = provider.noise_batch(len(clips))
        impulse = provider.impulse_batch(len(clips))
        key = jax.random.PRNGKey(seed + 31 * t_i)
        aug = np.asarray(augment_batch(key, audio, lengths, noise, impulse, cfg))
        scores = np.asarray(model(np.asarray(emb(aug), np.float32))).reshape(-1)
        rates[text] = round(float(np.mean(scores >= thr)), 4)
    ranked = sorted(rates.items(), key=lambda kv: -kv[1])
    firing = [(t, r) for t, r in ranked if r > 0]
    top5 = sum(r for _, r in ranked[:5])
    total = sum(r for _, r in ranked)
    return {
        "per_text_renderings": per_text,
        "texts": len(ranked),
        "texts_firing": len(firing),
        "top5_share": round(top5 / total, 3) if total else None,
        "profile": (
            "SPECIFIC" if total and top5 / total > 0.5 else "DIFFUSE"
        ),
        "rates": dict(ranked[:20]),
    }


def main() -> None:
    args = parse_args()
    if args.embedding:
        os.environ["HEYBUDDY_EMBEDDING_WEIGHTS"] = os.path.abspath(args.embedding)
    os.environ.setdefault("HEYBUDDY_OFFLINE", "1")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        from heybuddy_tpu.utils.downloads import get_cache_dir

        jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from heybuddy_tpu.data.features import TrainingFeaturesGenerator
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator
    from heybuddy_tpu.training.trainer import WakeWordTrainer
    from heybuddy_tpu.utils.log import logger

    if args.quick:
        args.train_samples = 24
        args.heldout_samples = 12
        args.partial_samples = 12
        args.stream_samples = 12
        args.val_stream_samples = 24
        args.steps = 40
        args.stream_minutes = min(args.stream_minutes, 1.0)
        args.stream_seeds = min(args.stream_seeds, 2)
        args.sliding_clips = min(args.sliding_clips, 6)
        args.no_snr_buckets = True
        args.mine_rounds = min(args.mine_rounds, 1)
        args.select_stream_minutes = min(args.select_stream_minutes, 1.0)
        args.select_adversarial_samples = min(args.select_adversarial_samples, 12)
        args.calibration_seeds = min(args.calibration_seeds, 1)
        args.mine_adversarial_clips = min(args.mine_adversarial_clips, 12)
        args.reverb_positives = min(args.reverb_positives, 12)

    # Rendered streams are embedding-agnostic waveforms: cache them in the
    # shared cache so multi-hour fp/hour costs synthesis once per seed ever.
    global _STREAM_CACHE_DIR
    try:
        from heybuddy_tpu.utils.downloads import get_cache_dir

        _STREAM_CACHE_DIR = get_cache_dir("quality-streams")
    except Exception:
        _STREAM_CACHE_DIR = ""

    dataset_dir = args.dataset_dir or tempfile.mkdtemp(prefix="quality-eval-")
    ckpt_dir = args.checkpoint_dir or os.path.join(dataset_dir, "ckpt")
    t0 = time.time()

    gen_kwargs = dict(
        directory=dataset_dir,
        tts_backend="formant",
        seed=args.seed,
    )
    hard_texts: list = []
    if args.hard_pair_boost > 0:
        hard_texts = derive_hard_pairs(args.phrase) * args.hard_pair_boost
        logger.info(
            f"hard-pair boost: {len(set(hard_texts))} phrases x "
            f"{args.hard_pair_boost} = {len(hard_texts)} pool entries: "
            f"{sorted(set(hard_texts))}"
        )
    if args.prefix_negatives > 0:
        from heybuddy_tpu.text.adversarial import prefix_negative_texts

        prefix_texts = prefix_negative_texts(
            args.phrase, num_samples=args.prefix_negatives, seed=args.seed
        )
        logger.info(
            f"prefix negatives: {len(prefix_texts)} texts "
            f"(deepest: {prefix_texts[:4]})"
        )
        hard_texts = hard_texts + prefix_texts
    collision_texts: list = []
    if args.collision_negatives > 0:
        from heybuddy_tpu.text.adversarial import single_swap_collision_texts

        # The held-out pool's exact texts (sidecar, or derived pre-cache):
        # the emphasis class transfers, the literal measured strings must
        # not be trained on.
        heldout_pool = TrainingFeaturesGenerator(
            args.phrase, **gen_kwargs
        ).adversarial_texts(testing=True, adversarial_phrases=60)
        collision_texts = single_swap_collision_texts(
            args.phrase, num_samples=args.collision_negatives,
            seed=args.seed, exclude=heldout_pool,
            max_swaps=args.collision_swap_depth,
        )
        logger.info(
            f"swap-collision negatives (depth<={args.collision_swap_depth}): "
            f"{len(collision_texts)} texts "
            f"(held-out pool excluded: {len(heldout_pool)} texts), "
            f"e.g. {collision_texts[:6]}"
        )
        hard_texts = hard_texts + collision_texts
    if args.reverb_collisions > 0 and not collision_texts:
        # Derive the emphasis pool with the same held-out exclusion the
        # --collision-negatives channel applies.
        from heybuddy_tpu.text.adversarial import single_swap_collision_texts

        heldout_pool = TrainingFeaturesGenerator(
            args.phrase, **gen_kwargs
        ).adversarial_texts(testing=True, adversarial_phrases=60)
        collision_texts = single_swap_collision_texts(
            args.phrase, num_samples=max(args.collision_negatives, 48),
            seed=args.seed, exclude=heldout_pool,
            max_swaps=args.collision_swap_depth,
        )
    train_gen_kwargs = dict(gen_kwargs)
    if hard_texts:
        train_gen_kwargs["custom_adversarial_texts"] = hard_texts
    gen = TrainingFeaturesGenerator(args.phrase, **train_gen_kwargs)
    # Held-out/report pools must stay free of the boosted pairs (they would
    # otherwise leak training emphasis into the FAR_adv estimate).
    gen_heldout = (
        TrainingFeaturesGenerator(args.phrase, **gen_kwargs) if hard_texts else gen
    )
    train_adv_pool = args.adversarial_phrases + len(hard_texts)

    if not args.eval_only:
        logger.info("=== generating training features ===")
        pos_train = gen.get_training_features(args.train_samples, adversarial=False)
        adv_train = gen.get_training_features(
            args.train_samples, adversarial=True,
        adversarial_phrases=args.adversarial_phrases
        )
        partial_train = (
            gen.get_partial_phrase_features(args.partial_samples)
            if args.partial_samples > 0
            else None
        )
        partial_adv_train = (
            gen.get_partial_phrase_features(
                args.partial_samples, adversarial=True,
                adversarial_phrases=train_adv_pool
            )
            if args.partial_samples > 0
            else None
        )
        speech_train = gen.get_negative_speech_features(
            args.train_samples, num_texts=400, seed=args.seed
        )
        stream_train = (
            gen.get_stream_window_features(args.stream_samples, seed=args.seed)
            if args.stream_samples > 0
            else None
        )
        stream_adv_train = (
            gen.get_stream_window_features(
                max(args.stream_samples // 2, 1), adversarial=True, seed=args.seed
            )
            if args.stream_samples > 0
            else None
        )
        stream_collision_train = (
            gen.get_stream_window_features(
                max(args.stream_samples // 2, 1), collision=True, seed=args.seed
            )
            if args.stream_samples > 0 and args.collision_streams
            else None
        )

    logger.info("=== generating held-out features ===")
    pos_test = gen.get_training_features(args.heldout_samples, adversarial=False, testing=True)
    adv_test = gen_heldout.get_training_features(
        args.heldout_samples, adversarial=True, adversarial_phrases=60, testing=True
    )
    speech_test = gen.get_negative_speech_features(
        args.heldout_samples, num_texts=200, seed=args.seed + 77
    )
    if not args.eval_only:
        # Clean (pad-only, unaugmented) positives as TRAINING coverage: the
        # augment chain never emits perfectly clean audio, and a model trained
        # only on augmented positives measurably rejects clean renderings
        # (clean FRR 0.575 vs augmented 0.26 before this was added).
        clean_train = gen.get_validation_features(max(args.train_samples // 4, 1))
        # Clean positives at RANDOM window offsets: the sliding runtime's
        # alignment distribution (pad-only is centered; heavy mining measurably
        # crushed sliding clean recall to 0.67 without this coverage).
        clean_offset_train = gen.get_clean_offset_features(max(args.train_samples // 4, 1))
        # The symmetric hard negative: clean NEAR-COLLISIONS at random offsets
        # (clean-offset positives otherwise pull clean adversaries at odd
        # alignments into the positive class — "hay bunny"'s clean sliding view
        # fired the consecutive gate 2/3 of the time while its full view scored
        # 0.00).
        clean_offset_adv_train = gen.get_clean_offset_features(
            max(args.train_samples // 4, 1), adversarial=True,
            adversarial_phrases=train_adv_pool
        )
        # Reverb-mode positives: the FRR-by-SNR reverb buckets' exact
        # distribution as dedicated positive coverage (features.py
        # get_reverb_positive_features docstring).
        reverb_train = (
            gen.get_reverb_positive_features(args.reverb_positives)
            if args.reverb_positives > 0
            else None
        )
        # Reverb-mode collision negatives: the shipped-v26 FAR-by-SNR
        # residual's exact distribution as dedicated negative coverage
        # (features.py get_reverb_collision_features docstring).
        reverb_collision_train = (
            gen.get_reverb_collision_features(
                args.reverb_collisions, collision_texts
            )
            if args.reverb_collisions > 0
            else None
        )
        # Validation sets for the dynamic negative-weight controller: DISJOINT
        # pad-only + clean-offset positives (testing caches, fresh seeds), and
        # stream windows from a seed disjoint from training's.
        val_pos = gen.get_validation_features(args.heldout_samples, testing=True)
        val_clean_offset = gen.get_clean_offset_features(args.heldout_samples, testing=True)
    # REPORTING sets, disjoint from BOTH training coverage and the
    # negative-weight controller's validation sets (fresh seed, separate
    # cache dir so the {phrase}-testing-validation cache names don't
    # collide): final clean-FRR metrics must not be measured on data any
    # training-time feedback loop ever saw.
    report_gen = TrainingFeaturesGenerator(
        args.phrase,
        directory=os.path.join(dataset_dir, "report"),
        tts_backend="formant",
        seed=args.seed + 50021,
    )
    report_clean = report_gen.get_validation_features(args.heldout_samples, testing=True)
    report_clean_offset = report_gen.get_clean_offset_features(
        args.heldout_samples, testing=True
    )
    val_stream = (
        gen.get_stream_window_features(args.val_stream_samples, seed=args.seed + 999)
        if args.val_stream_samples > 0 and not args.eval_only
        else None
    )

    from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator

    bs = max(4, min(25, args.train_samples // 8))

    def train_model(mined: list, label: str, seed_offset: int = 0):
        negative_specs = [(adv_train, bs), (clean_offset_adv_train, max(bs // 2, 1))]
        if partial_train is not None:
            negative_specs.append((partial_train, bs))
            negative_specs.append((partial_adv_train, bs))
        negative_specs.append((speech_train, bs))
        if reverb_collision_train is not None:
            negative_specs.append((reverb_collision_train, max(bs // 2, 1)))
        if stream_train is not None:
            negative_specs.append((stream_train, bs))
            negative_specs.append((stream_adv_train, bs))
            if stream_collision_train is not None:
                negative_specs.append((stream_collision_train, bs))
        if mined:
            mined_arr = np.concatenate(mined).astype(np.float32)
            negative_specs.append(
                (PrecalculatedDatasetIterator("mined", data=mined_arr, seed=args.seed), bs)
            )
            logger.info(f"training with {len(mined_arr)} mined hard negatives")
        positive_specs = [
            (pos_train, 2 * bs),
            (clean_train, max(bs // 2, 1)),
            (clean_offset_train, max(bs // 2, 1)),
        ]
        if reverb_train is not None:
            positive_specs.append((reverb_train, max(bs // 2, 1)))
        training = WakeWordTrainingDatasetIterator(
            num_batch_threads=1,
            positive=positive_specs,
            negative=negative_specs,
        )
        # Validation = pad-only positives + FRESH stream windows, driving the
        # trainer's dynamic negative-weight controller — the reference's own
        # fp-per-hour control loop (reference trainer.py:511-536) regulating
        # the actual operating distribution.
        validation = None
        if val_pos is not None and val_stream is not None:
            val_bs = max(len(val_stream) // 8, 1)
            val_pos_bs = max(args.heldout_samples // 16, 1)
            validation = WakeWordTrainingDatasetIterator(
                num_batch_threads=1,
                positive=[(val_pos, val_pos_bs), (val_clean_offset, val_pos_bs)],
                negative=[(val_stream, val_bs)],
            )
            validation.max_samples = 8
        logger.info(f"=== training classifier ({label}) ===")
        trainer = WakeWordTrainer(
            checkpoint_dir=ckpt_dir, seed=args.seed + seed_offset,
            num_layers=args.layers, layer_dim=args.layer_dim,
        )
        history = trainer.train_epoch(
            training,
            validation=validation,
            num_steps=args.steps,
            validation_steps=max(args.steps // 8, 50),
            negative_weight_schedule=(
                1.0 if args.fixed_negative_weight is None
                else args.fixed_negative_weight
            ),
            negative_weight_adjust_ratio=(
                2.0
                if validation is not None and args.fixed_negative_weight is None
                else None
            ),
            validation_gate_consecutive=args.validation_consecutive,
            checkpoint_steps=args.steps + 1,
            logging_steps=max(args.steps // 10, 1),
            name="quality-eval",
        )
        if validation is not None:
            vfp = history["validation_false_positive_per_hour"]
            nw = history["negative_weight"]
            logger.info(
                f"validation fp/hr trajectory: {[round(float(v), 1) for v in vfp[-5:]]}; "
                f"final negative weight {float(nw[-1]):.1f}"
            )
            validation.stop()
        training.stop()
        return trainer

    mined: list = []
    selection = None
    if args.eval_only:
        final = os.path.abspath(args.eval_only)
        if final.endswith(".onnx"):
            # Deployed artifacts (browser/models/hey-buddy.onnx) only exist
            # as ONNX; score them through the same runtime evaluator `predict`
            # uses so shipped bundles can be re-measured without an npz.
            from heybuddy_tpu.runtime.onnx_model import WakeWordONNXModel

            model = WakeWordONNXModel(final)
        elif final.endswith(".pt"):
            from heybuddy_tpu.models.wakeword import WakeWordMLPModel

            model = WakeWordMLPModel.from_torch_file(final)
        else:
            from heybuddy_tpu.models.wakeword import load_model

            model = load_model(final)
        logger.info(f"=== eval-only: re-scoring {final} ===")
    else:
        # --- hard-negative mining rounds -----------------------------------
        # Train, stream ordinary speech + adversarial phrases through the
        # sliding runtime, harvest every window scoring above the mining floor
        # as a negative, retrain. This targets exactly the operating metric
        # (false wakes per hour), which per-clip training negatives
        # under-represent.
        mine_minutes = max(args.stream_minutes / 4.0, 1.0)

        def train_and_mine(cand: int):
            """One full train+mine candidate; seeds vary per candidate."""
            cand_mined: list = []
            seed_offset = 7919 * cand
            tr = train_model(cand_mined, f"round 0 (cand {cand})", seed_offset)
            for r in range(args.mine_rounds):
                cand_model = tr.model
                speech_stream = synth_speech_stream(
                    mine_minutes, seed=args.seed + 100 + r + 100000 * cand,
                    exclude_phrase=args.phrase,
                )
                adv_stream = synth_adversarial_stream(
                    args.phrase, max(mine_minutes / 2.0, 1.0),
                    seed=args.seed + 200 + r + 100000 * cand,
                )
                mine_streams = [speech_stream, adv_stream]
                if args.collision_streams:
                    mine_streams.append(synth_collision_stream(
                        args.phrase, max(mine_minutes / 2.0, 1.0),
                        seed=args.seed + 300 + r + 100000 * cand,
                    ))
                new_mined = 0
                for stream in mine_streams:
                    feats, scores = sliding_features_scores(cand_model, stream)
                    hard = feats[scores >= args.mine_floor]
                    new_mined += len(hard)
                    if len(hard):
                        cand_mined.append(hard)
                clip_mined = 0
                if args.mine_adversarial_clips > 0:
                    # Clip-metric mining: stream mining harvests sliding
                    # WINDOWS, a different distribution than the augmented
                    # full-view clips FAR_adv is measured on — v23 drove
                    # stream fp/hr under target while clip FAR doubled.
                    # Render a fresh adversarial clip pool (new texts every
                    # round via the round seed; single-swap emphasis texts
                    # included) and harvest high scorers.
                    mine_gen = TrainingFeaturesGenerator(
                        args.phrase,
                        directory=os.path.join(
                            dataset_dir, f"mine-adv-{cand}-{r}"
                        ),
                        tts_backend="formant",
                        seed=args.seed + 900_000 + 100_000 * cand + 1_000 * r,
                        custom_adversarial_texts=(collision_texts or None),
                    )
                    mine_iter = mine_gen.get_training_features(
                        args.mine_adversarial_clips, adversarial=True,
                        adversarial_phrases=60 + len(collision_texts),
                    )
                    mine_feats = np.asarray(
                        mine_iter.precalculated[:], dtype=np.float32
                    )
                    mine_scores = np.asarray(
                        cand_model(mine_feats)
                    ).reshape(-1)
                    hard = mine_feats[mine_scores >= args.mine_floor]
                    clip_mined = len(hard)
                    new_mined += clip_mined
                    if clip_mined:
                        cand_mined.append(hard)
                logger.info(
                    f"mining round {r + 1}: {new_mined} hard negatives "
                    f"harvested ({clip_mined} adversarial clips)"
                )
                if new_mined == 0:
                    break
                tr = train_model(cand_mined, f"round {r + 1} (cand {cand})", seed_offset)
            return tr, cand_mined

        if args.select_runs > 1:
            # Train-K-select-on-validation: the mining loop's run-to-run
            # variance straddles the FAR/fp-hr targets (QUALITY.md controller
            # study), so train several candidates and keep the one that wins
            # on SELECTION data. Everything scored here is disjoint from the
            # report sets: a dedicated stream seed, a dedicated adversarial
            # generator directory/seed, and the controller's own clean-offset
            # validation positives (training-time-visible by design).
            sel_stream = synth_speech_stream(
                args.select_stream_minutes, seed=args.seed + 424243,
                exclude_phrase=args.phrase,
            )
            sel_hours = max(args.select_stream_minutes / 60.0, 1e-9)
            select_gen = TrainingFeaturesGenerator(
                args.phrase,
                directory=os.path.join(dataset_dir, "select"),
                tts_backend="formant",
                seed=args.seed + 60013,
            )
            sel_adv = select_gen.get_training_features(
                args.select_adversarial_samples, adversarial=True,
                adversarial_phrases=60, testing=True,
            )
            sel_adv_feats = np.asarray(sel_adv.precalculated[:], dtype=np.float32)
            sel_off_feats = np.asarray(
                val_clean_offset.precalculated[:], dtype=np.float32
            )
            # Selection-time recall: sliding renderings of the phrase itself
            # (disjoint seed from the report's sliding check). v23 won
            # selection while dropping a held-out detection because nothing
            # in the key priced a missed wake; the recall gate needs its own
            # measurement to act on.
            sel_rng = np.random.default_rng(args.seed + 515151)
            sel_pos_ctx = [
                _sliding_context(clip, sel_rng)
                for clip in _pipeline_clips(
                    args.phrase, 12, seed=args.seed + 515151
                )
            ]
            selection = []
            best = None
            all_mined: list = []

            def score_candidate(label: object, tr_c: object) -> tuple:
                model_c = tr_c.model  # type: ignore[attr-defined]
                det2 = count_detections(
                    sliding_scores(model_c, sel_stream), args.threshold,
                    consecutive=2,
                )
                sel_far = float(np.mean(
                    np.asarray(model_c(sel_adv_feats)).reshape(-1) >= args.threshold
                ))
                sel_frr_off = float(np.mean(
                    np.asarray(model_c(sel_off_feats)).reshape(-1) < args.threshold
                ))
                sel_recall = float(np.mean([
                    int(count_detections(
                        sliding_scores(model_c, ctx), args.threshold,
                        consecutive=2,
                    ) > 0)
                    for ctx in sel_pos_ctx
                ])) if sel_pos_ctx else 1.0
                key, fp2, fp2_upper, pen = selection_key(
                    det2, sel_hours, sel_far, sel_frr_off, sel_recall,
                )
                entry = {
                    "candidate": label,
                    "sel_fp_per_hour_c2": round(fp2, 3),
                    "sel_fp_per_hour_c2_upper": round(fp2_upper, 3),
                    "sel_far_adversarial": round(sel_far, 4),
                    "sel_frr_clean_offset": round(sel_frr_off, 4),
                    "sel_recall_c2": round(sel_recall, 4),
                    "penalty": round(pen, 4),
                }
                selection.append(entry)
                logger.info(f"selection: {entry}")
                return key, entry

            for cand in range(args.select_runs):
                tr_c, mined_c = train_and_mine(cand)
                all_mined.extend(mined_c)
                key, _ = score_candidate(cand, tr_c)
                if best is None or key < best[0]:
                    best = (key, cand, tr_c, mined_c)
            assert best is not None
            if args.select_consolidate and args.select_runs > 1:
                # Consolidation: one more train on the UNION of every
                # candidate's mined hard negatives — K independent mining
                # trajectories harvest different failure modes, and a single
                # candidate only ever trains on its own. Competes on the same
                # selection data; replaces the winner only if it wins there.
                tr_u = train_model(
                    all_mined,
                    f"consolidated (union of {args.select_runs} minings)",
                    7919 * best[1],
                )
                key, _ = score_candidate("consolidated", tr_u)
                if key < best[0]:
                    best = (key, "consolidated", tr_u, all_mined)
            _, sel_cand, trainer, mined = best
            for e in selection:
                e["selected"] = e["candidate"] == sel_cand
            logger.info(
                f"selected candidate {sel_cand} of {args.select_runs} "
                f"(held-out reporting uses only the winner)"
            )
        else:
            trainer, mined = train_and_mine(0)
            selection = None

        trainer.save_checkpoint("quality-eval_final")
        final = os.path.join(ckpt_dir, "quality-eval_final.npz")
        model = trainer.model

    def class_scores(iterator) -> np.ndarray:
        feats = iterator.precalculated[:]
        return np.asarray(model(np.asarray(feats, dtype=np.float32))).reshape(-1)

    def stats(scores: np.ndarray) -> dict:
        return {
            "mean": round(float(scores.mean()), 4),
            "p10": round(float(np.percentile(scores, 10)), 4),
            "p50": round(float(np.percentile(scores, 50)), 4),
            "p90": round(float(np.percentile(scores, 90)), 4),
        }

    thr = args.threshold
    pos_scores = class_scores(pos_test)
    adv_scores = class_scores(adv_test)
    speech_scores = class_scores(speech_test)
    clean_scores = class_scores(report_clean)  # pad-only (unaugmented) positives
    clean_offset_scores = class_scores(report_clean_offset)  # clean, random offset
    frr = float(np.mean(pos_scores < thr))
    frr_clean = float(np.mean(clean_scores < thr))
    frr_clean_offset = float(np.mean(clean_offset_scores < thr))
    far_adv = float(np.mean(adv_scores >= thr))
    far_speech = float(np.mean(speech_scores >= thr))
    score_stats = {
        "positive": stats(pos_scores),
        "adversarial": stats(adv_scores),
        "speech": stats(speech_scores),
    }
    logger.info(
        f"FRR={frr:.4f} (clean {frr_clean:.4f}, clean-offset {frr_clean_offset:.4f}) "
        f"FAR_adv={far_adv:.4f} "
        f"FAR_speech={far_speech:.4f}"
    )
    logger.info(f"score stats: {score_stats}")

    far_attrib = None
    if args.far_attribution > 0:
        # The EXACT text pool the adv_test cache rendered (recorded in its
        # .texts.json sidecar at generation time). Re-deriving 60 texts from
        # args.seed measured only 16/60 overlap with the real pool — the
        # adversarial caches seed their generator at
        # seed + existing + _SEED_NAMESPACE (testing block), not args.seed —
        # so earlier committed attributions mostly ranked texts OUTSIDE the
        # held-out FAR_adv pool while claiming otherwise.
        heldout_texts = gen_heldout.adversarial_texts(
            testing=True, adversarial_phrases=60
        )
        logger.info("=== per-text FAR attribution ===")
        far_attrib = far_attribution(
            model, heldout_texts, seed=args.seed, thr=thr,
            per_text=args.far_attribution,
        )
        logger.info(
            f"FAR attribution: {far_attrib['texts_firing']}/{far_attrib['texts']} "
            f"texts fire; top-5 share {far_attrib['top5_share']} "
            f"({far_attrib['profile']}); top rates "
            f"{dict(list(far_attrib['rates'].items())[:8])}"
        )

    # Multi-seed streaming: one hour has ~10x seed noise in fp/hour (the same
    # config measured 1.0 and 10.0/hr across seeds in round 2), so the
    # harness always measures >= args.stream_seeds independent streams and
    # reports the per-run spread alongside the aggregate — never a bare
    # single-stream point estimate.
    n_runs = max(args.stream_seeds, 1)
    run_hours = args.stream_minutes / 60.0
    hours = n_runs * run_hours
    logger.info(
        f"=== streaming fp/hour: {n_runs} x {args.stream_minutes:.0f} min "
        f"({hours:.1f} h total) ==="
    )
    score_runs = []
    fp_runs = []
    fp_runs_c2 = []
    fp_counts = []
    fp_counts_c2 = []
    for k in range(n_runs):
        stream = synth_speech_stream(
            args.stream_minutes, seed=args.seed + 31 + 1009 * k,
            exclude_phrase=args.phrase,
        )
        s = sliding_scores(model, stream)
        score_runs.append(s)
        d = count_detections(s, thr)
        d2 = count_detections(s, thr, consecutive=2)
        fp_counts.append(int(d))
        fp_counts_c2.append(int(d2))
        fp_runs.append(d / max(run_hours, 1e-9))
        fp_runs_c2.append(d2 / max(run_hours, 1e-9))
        logger.info(
            f"  stream {k + 1}/{n_runs}: {d} raw / {d2} gated detections "
            f"({fp_runs[-1]:.1f} / {fp_runs_c2[-1]:.1f} per hr)"
        )
    detections = int(sum(fp_counts))
    fp_per_hour = float(np.mean(fp_runs))
    logger.info(
        f"stream aggregate: {fp_per_hour:.2f}/hr raw over {hours:.2f} h "
        f"(per-run {['%.1f' % v for v in fp_runs]})"
    )

    # Operating point: the threshold meeting the reference's 1.5 false
    # wakes/hour target aggregated over all streams, and the recall cost of
    # running there.
    op_thr = operating_threshold(score_runs, hours)
    op_frr = float(np.mean(pos_scores < op_thr))
    op_frr_clean = float(np.mean(clean_scores < op_thr))
    op_frr_clean_offset = float(np.mean(clean_offset_scores < op_thr))
    op_fp_per_hour = sum(
        count_detections(s, op_thr) for s in score_runs
    ) / max(hours, 1e-9)
    logger.info(
        f"operating point: thr={op_thr} -> {op_fp_per_hour:.2f} fp/hr, "
        f"FRR={op_frr:.4f} (clean {op_frr_clean:.4f})"
    )
    op_warnings = operating_point_warnings(op_thr, op_frr, hours)
    for w in op_warnings:
        logger.warning(f"operating point (raw): {w}")

    # Consecutive-window gate (runtime/detection.py): stream FPs are mostly
    # single-window spikes while a true utterance holds the phrase inside the
    # window for several strides, so requiring 2 consecutive windows cuts
    # fp/hr at little recall cost and buys a far gentler operating threshold.
    fp_per_hour_c2 = float(np.mean(fp_runs_c2))
    op_thr_c2 = operating_threshold(score_runs, hours, consecutive=2)
    op_frr_c2 = float(np.mean(pos_scores < op_thr_c2))
    op_frr_clean_c2 = float(np.mean(clean_scores < op_thr_c2))
    op_frr_clean_offset_c2 = float(np.mean(clean_offset_scores < op_thr_c2))
    logger.info(
        f"consecutive=2 gate: {fp_per_hour_c2:.2f} fp/hr at thr={thr}; "
        f"operating thr={op_thr_c2} -> FRR={op_frr_c2:.4f} (clean {op_frr_clean_c2:.4f})"
    )
    op_warnings_c2 = operating_point_warnings(op_thr_c2, op_frr_c2, hours)
    for w in op_warnings_c2:
        logger.warning(f"operating point (c2): {w}")

    logger.info("=== sliding-offset phrase check (pipeline-rendered) ===")
    rng = np.random.default_rng(args.seed + 5)
    sliding = {}
    sliding_c2 = {}
    sliding_counts: dict = {}
    sliding_runs: dict = {}
    for text in [args.phrase] + ADVERSARIAL_SLIDING_PHRASES:
        # The wake phrase's gated fire rate IS the product's recall (the
        # deployed runtime lives at the 2-consecutive gate), so it gets a
        # larger rendering sample than the adversarial probes.
        n_clips = args.sliding_clips if text == args.phrase else 6
        maxima = []
        fired_c2 = []
        sliding_runs[text] = []
        for clip in _pipeline_clips(text, n_clips, seed=args.seed + 5):
            ctx = _sliding_context(clip, rng)
            s = sliding_scores(model, ctx)
            sliding_runs[text].append(s)
            maxima.append(float(s.max()) if s.size else 0.0)
            fired_c2.append(int(count_detections(s, thr, consecutive=2) > 0))
        sliding[text] = round(float(np.mean(maxima)), 3)
        sliding_c2[text] = round(float(np.mean(fired_c2)), 3)
        sliding_counts[text] = (int(sum(fired_c2)), len(fired_c2))
        logger.info(
            f"  {text!r}: mean max score {sliding[text]}, "
            f"consecutive=2 fire rate {sliding_c2[text]}"
        )
    sliding_recall_c2 = sliding_c2[args.phrase]

    # --- threshold tradeoff curve ----------------------------------------
    # Every headline metric at a grid of thresholds, from the score arrays
    # already in memory (zero extra rendering/scoring). Motivation: v23's
    # adversarial failures are NOT saturated (p90 0.79 while clean positives
    # sit at 0.9999), so the deployed calibrated threshold — a product
    # mechanism, reference wakeword.py ships per-head thresholds — may trade
    # FAR/fp-hr against a recall margin the fixed 0.5 report hides. The
    # curve shows at a glance whether ANY operating point passes all five
    # targets simultaneously.
    threshold_curve = []
    for t in (0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.98, 0.99):
        t_recall_counts = [
            int(count_detections(s, t, consecutive=2) > 0)
            for s in sliding_runs[args.phrase]
        ]
        t_fp_counts = [
            int(count_detections(s, t, consecutive=2)) for s in score_runs
        ]
        threshold_curve.append({
            "threshold": t,
            "far_adversarial": round(float(np.mean(adv_scores >= t)), 4),
            "far_speech": round(float(np.mean(speech_scores >= t)), 4),
            "frr_clean": round(float(np.mean(clean_scores < t)), 4),
            "frr_clean_offset": round(
                float(np.mean(clean_offset_scores < t)), 4),
            "sliding_recall_c2": round(
                float(np.mean(t_recall_counts)), 4),
            "fp_per_hour_c2": round(sum(t_fp_counts) / max(hours, 1e-9), 3),
        })
    curve_pass = [
        c for c in threshold_curve
        if c["sliding_recall_c2"] >= 0.95 and c["far_adversarial"] <= 0.05
        and c["frr_clean"] <= 0.05 and c["frr_clean_offset"] <= 0.05
        and c["fp_per_hour_c2"] <= 1.5
    ]
    logger.info(
        "threshold curve (thr: FAR_adv / fp_hr_c2 / recall_c2 / frr_clean): "
        + "; ".join(
            f"{c['threshold']}: {c['far_adversarial']:.3f}/"
            f"{c['fp_per_hour_c2']:.2f}/{c['sliding_recall_c2']:.2f}/"
            f"{c['frr_clean']:.3f}"
            for c in threshold_curve
        )
    )
    if curve_pass:
        logger.info(
            f"threshold(s) passing ALL 5 targets: "
            f"{[c['threshold'] for c in curve_pass]}"
        )

    # --- calibrated operating point -------------------------------------
    # The deployed product ships a calibrated per-head threshold (browser
    # runtime, reference models/wake-word.ts checkWakeWordCalled), not a
    # fixed 0.5. Calibrate the c2 threshold on SEPARATE calibration streams
    # (seed-disjoint from the measurement streams so the pick is honest),
    # then re-evaluate every target at that threshold on held-out data.
    calibrated: dict = {}
    if args.calibration_seeds > 0:
        logger.info(
            f"=== calibrating threshold on {args.calibration_seeds} x "
            f"{args.stream_minutes:.0f} min disjoint streams ==="
        )
        cal_runs = []
        for k in range(args.calibration_seeds):
            cal_stream = synth_speech_stream(
                args.stream_minutes, seed=args.seed + 71 + 1009 * k,
                exclude_phrase=args.phrase,
            )
            cal_runs.append(sliding_scores(model, cal_stream))
        cal_hours = args.calibration_seeds * run_hours
        cal_thr = operating_threshold(cal_runs, cal_hours, consecutive=2)
        cal_thr = max(cal_thr, thr)
        cal_fp_c2_counts = [
            int(count_detections(s, cal_thr, consecutive=2)) for s in score_runs
        ]
        cal_fp_c2_runs = [d / max(run_hours, 1e-9) for d in cal_fp_c2_counts]
        cal_recall_runs = [
            float(np.mean([
                int(count_detections(s, cal_thr, consecutive=2) > 0)
                for s in sliding_runs[text]
            ]))
            for text in sliding_runs
        ]
        cal_sliding_c2 = dict(zip(sliding_runs.keys(), [round(v, 3) for v in cal_recall_runs]))
        cal_recall = cal_sliding_c2[args.phrase]
        cal_far_adv = float(np.mean(adv_scores >= cal_thr))
        cal_frr_clean = float(np.mean(clean_scores < cal_thr))
        cal_frr_clean_offset = float(np.mean(clean_offset_scores < cal_thr))
        cal_fp_per_hour_c2 = float(np.mean(cal_fp_c2_runs))
        cal_targets = {
            "sliding_recall_c2>=0.95": cal_recall >= 0.95,
            "far_adversarial<=0.05": cal_far_adv <= 0.05,
            "frr_clean<=0.05": cal_frr_clean <= 0.05,
            "frr_clean_offset<=0.05": cal_frr_clean_offset <= 0.05,
            "fp_per_hour_c2<=1.5": cal_fp_per_hour_c2 <= 1.5,
        }
        cal_warnings = operating_point_warnings(cal_thr, cal_frr_clean, cal_hours)
        for w in cal_warnings:
            logger.warning(f"calibrated block: {w}")
        calibrated = {
            "threshold": cal_thr,
            "calibration_hours": round(cal_hours, 2),
            "warnings": cal_warnings,
            "degenerate": bool(cal_warnings),
            "fp_per_hour_c2": round(cal_fp_per_hour_c2, 3),
            "fp_per_hour_runs_c2": [round(v, 2) for v in cal_fp_c2_runs],
            "sliding_recall_c2": cal_recall,
            "sliding_consecutive2_fire_rate": cal_sliding_c2,
            "far_adversarial": round(cal_far_adv, 4),
            "frr_clean": round(cal_frr_clean, 4),
            "frr_clean_offset": round(cal_frr_clean_offset, 4),
            "targets_met": cal_targets,
            "all_targets_met": all(cal_targets.values()),
            "intervals": {
                "far_adversarial": wilson_interval(
                    int((adv_scores >= cal_thr).sum()), len(adv_scores)),
                "frr_clean": wilson_interval(
                    int((clean_scores < cal_thr).sum()), len(clean_scores)),
                "sliding_recall_c2": wilson_interval(
                    int(sum(
                        int(count_detections(s, cal_thr, consecutive=2) > 0)
                        for s in sliding_runs[args.phrase]
                    )),
                    len(sliding_runs[args.phrase]),
                ),
                "fp_per_hour_c2": poisson_rate_interval(
                    sum(cal_fp_c2_counts), hours),
            },
        }
        logger.info(
            f"calibrated thr={cal_thr} -> fp/hr_c2={cal_fp_per_hour_c2:.2f} "
            f"(held-out), recall_c2={cal_recall}, FAR_adv={cal_far_adv:.4f}, "
            f"clean FRR={cal_frr_clean:.4f}/{cal_frr_clean_offset:.4f}; targets: "
            + ", ".join(f"{k}={'PASS' if v else 'FAIL'}" for k, v in cal_targets.items())
        )

    # 95% intervals for every headline rate: point estimates from finite
    # rendering samples straddle the targets run-to-run (QUALITY.md controller
    # study), so the sample sizes and the uncertainty they buy are first-class
    # outputs, not footnotes.
    det_c2_total = int(sum(fp_counts_c2))
    recall_k, recall_n = sliding_counts[args.phrase]
    intervals = {
        "far_adversarial": wilson_interval(
            int((adv_scores >= thr).sum()), len(adv_scores)),
        "far_speech": wilson_interval(
            int((speech_scores >= thr).sum()), len(speech_scores)),
        "frr_clean": wilson_interval(
            int((clean_scores < thr).sum()), len(clean_scores)),
        "frr_clean_offset": wilson_interval(
            int((clean_offset_scores < thr).sum()), len(clean_offset_scores)),
        "sliding_recall_c2": wilson_interval(recall_k, recall_n),
        "fp_per_hour_consecutive2": poisson_rate_interval(det_c2_total, hours),
        "n": {
            "adversarial": len(adv_scores),
            "speech": len(speech_scores),
            "clean": len(clean_scores),
            "clean_offset": len(clean_offset_scores),
            "sliding_renderings": recall_n,
            "stream_detections_c2": det_c2_total,
            "stream_hours": round(hours, 2),
        },
        "basis": "Wilson 95% (rates) / Garwood 95% (fp per hour)",
    }
    logger.info(
        "95% intervals: "
        + ", ".join(
            f"{k}={v}" for k, v in intervals.items() if k not in ("n", "basis")
        )
    )

    # HEADLINE: every target at the production operating point, together.
    targets_met = {
        "sliding_recall_c2>=0.95": sliding_recall_c2 >= 0.95,
        "far_adversarial<=0.05": far_adv <= 0.05,
        "frr_clean<=0.05": frr_clean <= 0.05,
        "frr_clean_offset<=0.05": frr_clean_offset <= 0.05,
        "fp_per_hour_c2<=1.5": fp_per_hour_c2 <= 1.5,
    }
    logger.info(
        f"HEADLINE sliding-gate recall (c2) = {sliding_recall_c2} over "
        f"{args.sliding_clips} renderings; targets: "
        + ", ".join(f"{k}={'PASS' if v else 'FAIL'}" for k, v in targets_met.items())
    )

    # FRR by SNR/reverb bucket: locates the augmented-positive miss tail
    # (inaudible clips vs fixable mid-SNR misses, VERDICT r2 weak #8).
    frr_by_snr = {}
    far_by_snr = {}
    if not args.no_snr_buckets:
        logger.info("=== FRR by SNR / reverb bucket ===")
        frr_by_snr = frr_by_snr_buckets(model, args.phrase, args.seed, thr)
        for k, v in frr_by_snr.items():
            logger.info(f"  {k}: FRR {v}")
        logger.info("=== FAR (unseen swap family) by SNR / reverb bucket ===")
        far_by_snr = far_by_snr_buckets(model, args.phrase, args.seed, thr)
        for k, v in far_by_snr.items():
            logger.info(f"  {k}: FAR {v}")

    results = {
        "phrase": args.phrase,
        "threshold": thr,
        "embedding": args.embedding or "packaged-default",
        "train_samples": args.train_samples,
        "partial_samples": args.partial_samples,
        "adversarial_phrases": args.adversarial_phrases,
        "hard_pair_boost": args.hard_pair_boost,
        "prefix_negatives": args.prefix_negatives,
        "collision_negatives": args.collision_negatives,
        "collision_swap_depth": args.collision_swap_depth,
        "mine_adversarial_clips": args.mine_adversarial_clips,
        "reverb_positives": args.reverb_positives,
        "steps": args.steps,
        "layers": args.layers,
        "layer_dim": args.layer_dim,
        "fixed_negative_weight": args.fixed_negative_weight,
        "frr": round(frr, 4),
        "frr_clean": round(frr_clean, 4),
        "frr_clean_offset": round(frr_clean_offset, 4),
        "far_adversarial": round(far_adv, 4),
        "far_speech": round(far_speech, 4),
        "stream_minutes": args.stream_minutes,
        "stream_seeds": n_runs,
        "stream_hours_total": round(hours, 2),
        "stream_detections": detections,
        "fp_per_hour": round(fp_per_hour, 3),
        "fp_per_hour_runs": [round(v, 2) for v in fp_runs],
        "fp_per_hour_runs_consecutive2": [round(v, 2) for v in fp_runs_c2],
        "mine_rounds": args.mine_rounds,
        "mined_negatives": int(sum(len(m) for m in mined)),
        "select_runs": args.select_runs,
        "selection": selection,
        "operating_threshold": op_thr,
        "operating_fp_per_hour": round(float(op_fp_per_hour), 3),
        "operating_frr": round(op_frr, 4),
        "operating_frr_clean": round(op_frr_clean, 4),
        "operating_frr_clean_offset": round(op_frr_clean_offset, 4),
        "fp_per_hour_consecutive2": round(float(fp_per_hour_c2), 3),
        "operating_warnings": op_warnings + op_warnings_c2,
        "threshold_curve": threshold_curve,
        "threshold_curve_all_targets": [c["threshold"] for c in curve_pass],
        "operating_threshold_consecutive2": op_thr_c2,
        "operating_frr_consecutive2": round(op_frr_c2, 4),
        "operating_frr_clean_consecutive2": round(op_frr_clean_c2, 4),
        "operating_frr_clean_offset_consecutive2": round(op_frr_clean_offset_c2, 4),
        "score_stats": score_stats,
        "clean_positive_stats": stats(clean_scores),
        "clean_offset_stats": stats(clean_offset_scores),
        "sliding_max_scores": sliding,
        "sliding_consecutive2_fire_rate": sliding_c2,
        "sliding_recall_c2": sliding_recall_c2,
        "sliding_clips": args.sliding_clips,
        "targets_met": targets_met,
        "all_targets_met": all(targets_met.values()),
        "intervals": intervals,
        "calibrated": calibrated,
        "far_attribution": far_attrib,
        "frr_by_snr": frr_by_snr,
        "far_by_snr": far_by_snr,
        "checkpoint": final,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
