"""
Continuous-speech stream synthesis and sliding-window featurization.

The deployed runtime never sees isolated clips: it scores a 1.44 s window
sliding 0.12 s at a time over continuous audio (browser batcher,
reference hey-buddy.ts:140-141; `listen`, reference __main__.py:466-597).
Per-clip negatives under-represent that distribution — a model can pass
held-out clip FAR while false-firing hundreds of times per hour on a
stream, because stream windows straddle phrase boundaries at every offset
(measured: 1.8% clip FAR / 243 false wakes per hour pre-mining).

This module makes the stream distribution a first-class data source:

* ``synth_speech_stream`` — continuous ordinary speech (random phrases,
  wake words excluded) with inter-phrase gaps and light background noise,
  rendered through the SAME TTS pipeline training uses.
* ``synth_adversarial_stream`` — continuous phonetic near-collisions of the
  wake phrase (the hard-negative surface for sliding-offset false accepts).
* ``stream_window_clips`` — every runtime window position of a stream as a
  (n, window) clip batch.

Used by ``TrainingFeaturesGenerator.get_stream_window_features`` (training
coverage) and ``scripts/quality_eval.py`` (the fp/hour operating metric and
hard-negative mining). No reference equivalent: the reference trains on
clips only and relies on its hosted real-speech negative sets.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from heybuddy_tpu.constants import CLIP_SAMPLES, SAMPLE_RATE

__all__ = [
    "synth_speech_stream",
    "synth_adversarial_stream",
    "synth_collision_salad_stream",
    "stream_window_clips",
    "stream_window_count",
    "RUNTIME_WINDOW_STRIDE",
]

# The browser batcher fires every 0.12 s (reference hey-buddy.ts:141) = 1920
# samples at 16 kHz — the stride at which deployed models actually score.
RUNTIME_WINDOW_STRIDE = 1920


def texts_to_stream(
    texts: Sequence[str],
    minutes: float,
    seed: int,
    sample_rate: int = SAMPLE_RATE,
    tts_backend: Optional[str] = None,
    snr_db_range: tuple = (20.0, 30.0),
    return_schedule: bool = False,
) -> Union[np.ndarray, Tuple[np.ndarray, List[dict]]]:
    """Render a weighted text list as one continuous float32 stream in
    [-1, 1]: phrases with random gain, inter-phrase gaps of 0.15-1.2 s, and
    light white background noise at a random SNR.

    ``return_schedule=True`` also returns ``[(start, end, text), ...]`` sample
    spans — used to attribute sliding-window false positives to the phrase(s)
    under them (false-accept diagnostics in scripts/)."""
    from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator

    rng = np.random.default_rng(seed)
    # The device renderer amortizes one jitted dispatch per batch (~3.3 ms
    # tax, PERF.md), so feed it full batches; the host renderer keeps the
    # small batch to bound staging RAM.
    resolved = tts_backend or os.environ.get("HEYBUDDY_TTS_BACKEND")
    batch_size = 128 if resolved in ("formant-device", "device") else 8
    gen = SpeechSampleGenerator(
        texts[0], additional_phrases=list(texts[1:]), batch_size=batch_size,
        seed=seed, tts_backend=tts_backend, phrase_augment_prob=0.0,
    )
    total = int(minutes * 60 * sample_rate)
    out = np.zeros(total, dtype=np.float32)
    schedule: List[tuple] = []
    pos = 0
    # ~1.6 s per phrase incl. gap -> generous sample budget
    for sample in gen(int(minutes * 60 / 1.2) + 16):
        clip = np.asarray(sample["audio"]["array"], dtype=np.float32)
        if np.abs(clip).max() > 4.0:  # int16-scale PCM
            clip = clip / 32768.0
        clip = clip * float(rng.uniform(0.3, 1.0))
        end = min(pos + len(clip), total)
        out[pos:end] = clip[: end - pos]
        schedule.append((pos, end, sample.get("phrase", "")))
        pos = end + int(rng.uniform(0.15, 1.2) * sample_rate)
        if pos >= total:
            break
    noise = rng.normal(0.0, 1.0, total).astype(np.float32)
    speech_rms = float(np.sqrt(np.mean(out**2)) + 1e-9)
    snr_db = float(rng.uniform(*snr_db_range))
    noise *= speech_rms / (10 ** (snr_db / 20.0)) / (np.sqrt(np.mean(noise**2)) + 1e-9)
    stream = np.clip(out + noise, -1.0, 1.0)
    if return_schedule:
        return stream, schedule
    return stream


def synth_speech_stream(
    minutes: float,
    seed: int,
    exclude_phrase: str = "",
    num_texts: int = 256,
    tts_backend: Optional[str] = None,
    return_schedule: bool = False,
) -> Union[np.ndarray, Tuple[np.ndarray, List[dict]]]:
    """Continuous ordinary speech: pipeline-rendered random phrases (words of
    ``exclude_phrase`` removed from the vocabulary) with gaps plus noise.

    ``return_schedule=True`` passes through ``texts_to_stream``'s phrase-span
    schedule, so diagnostics attribute false positives to the SAME text
    distribution training negatives come from (scripts/diagnose_stream_fps.py
    must not re-derive the vocabulary loop and silently diverge)."""
    from heybuddy_tpu.text.wordlist import WORDS

    rng = np.random.default_rng(seed)
    vocabulary = sorted(set(WORDS) - set(exclude_phrase.lower().split()))
    texts: List[str] = []
    for _ in range(num_texts):
        n_words = int(rng.integers(1, 7))
        texts.append(" ".join(rng.choice(vocabulary, size=n_words, replace=False)))
    return texts_to_stream(
        texts, minutes, seed, tts_backend=tts_backend, return_schedule=return_schedule
    )


def synth_adversarial_stream(
    phrase: str,
    minutes: float,
    seed: int,
    num_texts: int = 120,
    tts_backend: Optional[str] = None,
) -> np.ndarray:
    """Continuous stream of phonetic near-collisions of ``phrase``."""
    from heybuddy_tpu.text.adversarial import get_adversarial_text_generator

    texts = list(get_adversarial_text_generator()(phrase, num_samples=num_texts, seed=seed))
    if not texts:
        # A neighbor-less phrase yields no adversarial texts (the generator's
        # degenerate-case early return). Ordinary speech excluding the phrase
        # is the only safe fallback — streaming the phrase itself would plant
        # true positives in a NEGATIVE stream.
        return synth_speech_stream(
            minutes, seed + 1, exclude_phrase=phrase, tts_backend=tts_backend
        )
    return texts_to_stream(texts, minutes, seed + 1, tts_backend=tts_backend)


def synth_collision_salad_stream(
    phrase: str,
    minutes: float,
    seed: int,
    num_texts: int = 160,
    tts_backend: Optional[str] = None,
    return_schedule: bool = False,
) -> Union[np.ndarray, Tuple[np.ndarray, List[dict]]]:
    """Word salads seeded with the phrase's phonetic-NEIGHBOR words.

    Measured motivation (QUALITY.md round 5): diagnosing the v22 winner's
    gated stream false positives showed every event was a multi-word salad
    containing near-collision vocabulary ("since BEAUTY mind STEADY
    remember", "sea MUDDY"), scored at saturation — a failure mode ordinary
    speech streams contain too sparsely (~2/hour) to mine efficiently and
    adversarial streams miss entirely (their texts are short near-collision
    phrases, not collisions embedded in unrelated context). This stream
    densifies exactly that surface: random salads where 1-2 words are
    replaced by lexicon neighbors of the phrase's words.

    The phrase's own words never appear (a negative stream must not plant
    true positives).
    """
    from heybuddy_tpu.text.adversarial import get_adversarial_text_generator
    from heybuddy_tpu.text.wordlist import WORDS

    words = phrase.lower().split()
    g = get_adversarial_text_generator()
    neighbors = sorted(
        {w for pw in words for w in g.adversarial_words(pw)} - set(words)
    )
    rng = np.random.default_rng(seed)
    vocabulary = sorted(set(WORDS) - set(words))
    if not neighbors:
        neighbors = vocabulary  # neighbor-less phrase: plain salad
    texts: List[str] = []
    for _ in range(num_texts):
        n_words = int(rng.integers(2, 7))
        salad = list(rng.choice(vocabulary, size=n_words, replace=False))
        n_coll = int(rng.integers(1, 3))
        for p in rng.choice(n_words, size=min(n_coll, n_words), replace=False):
            salad[int(p)] = str(rng.choice(neighbors))
        texts.append(" ".join(salad))
    # seed+2: speech streams render at `seed` and adversarial at `seed+1`;
    # reusing either here would give collision segments the exact
    # speaker/settings/gap/noise RNG draws of another negative kind
    # segment-for-segment (callers stride all kinds by the same row-offset
    # formula), collapsing effective negative diversity. Changing this
    # offset invalidates cached collision-stream features.
    return texts_to_stream(
        texts, minutes, seed + 2, tts_backend=tts_backend,
        return_schedule=return_schedule,
    )


def stream_window_count(
    stream: np.ndarray,
    window: int = CLIP_SAMPLES,
    stride: int = RUNTIME_WINDOW_STRIDE,
) -> int:
    """Number of runtime window positions in a stream."""
    return max((len(stream) - window) // stride + 1, 0)


def stream_window_clips(
    stream: np.ndarray,
    window: int = CLIP_SAMPLES,
    stride: int = RUNTIME_WINDOW_STRIDE,
    start: int = 0,
    count: Optional[int] = None,
) -> np.ndarray:
    """(t,) stream -> (n, window) float32 batch of runtime window positions,
    exactly what the sliding runtime scores.

    ``start``/``count`` select a window-index range so large streams can be
    featurized in batches without materializing every window at once — the
    ONE place the runtime-window geometry lives (features.py and the
    diagnostics must call this, not re-derive the stride arithmetic)."""
    n = stream_window_count(stream, window=window, stride=stride)
    if count is not None:
        n = min(n, start + count)
    if start >= n:
        return np.zeros((0, window), dtype=np.float32)
    starts = np.arange(start, n) * stride
    return np.stack([stream[s : s + window] for s in starts]).astype(np.float32)
