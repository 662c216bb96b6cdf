"""TTS: formant backend, generator contract, VITS shapes, feature orchestration."""

import itertools
import os

import numpy as np
import pytest

from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator
from heybuddy_tpu.models.formant import FormantSynthesizer
from heybuddy_tpu.models.tts import FormantTTS


def test_formant_synthesizer_deterministic_and_distinct():
    synth = FormantSynthesizer()
    a = synth.synthesize("hey buddy", speaker=1)
    b = synth.synthesize("hey buddy", speaker=1)
    np.testing.assert_array_equal(a, b)
    c = synth.synthesize("hello world", speaker=1)
    assert a.shape != c.shape or not np.allclose(a, c)
    d = synth.synthesize("hey buddy", speaker=2)
    assert not np.array_equal(a, d)
    assert np.abs(a).max() <= 1.0
    assert len(a) > 4000


def test_formant_articulation_cues():
    """v2 articulation model: the cues wake-word discrimination hinges on
    must be present and systematic (VERDICT r2 next #2)."""
    synth = FormantSynthesizer()

    # (1) minimal pair "buddy"/"bunny": intervocalic /d/ flaps (~30 ms weak
    # tap) while /n/ is a long murmur -> "hey bunny" renders LONGER and the
    # pair is systematically separable across speakers.
    d_durs = [len(synth.synthesize("hey buddy", speaker=s, seed=7)) for s in range(4)]
    n_durs = [len(synth.synthesize("hey bunny", speaker=s, seed=7)) for s in range(4)]
    assert np.mean(n_durs) > np.mean(d_durs)

    # (2) vowel intrinsic duration: low AA ("body") longer than AH ("buddy")
    body = len(synth.synthesize("body", speaker=0, seed=7))
    buddy = len(synth.synthesize("buddy", speaker=0, seed=7))
    assert body > buddy

    # (3) nasalization: "bunny" carries more low-frequency (murmur) energy
    # relative to mid-frequency than "buddy" in the consonant region
    def band_ratio(text):
        audio = synth.synthesize(text, speaker=0, seed=7)
        spec = np.abs(np.fft.rfft(audio))
        freqs = np.fft.rfftfreq(len(audio), 1 / 16000)
        low = spec[(freqs > 150) & (freqs < 450)].sum()
        mid = spec[(freqs > 2000) & (freqs < 5000)].sum()
        return low / (mid + 1e-9)

    assert band_ratio("hey bunny") > band_ratio("hey buddy")

    # (4) prosody: stressed first vowel -> utterance pitch declines; check
    # audio is finite, bounded, and long enough to carry the phrase
    a = synth.synthesize("hey buddy how are you", speaker=3)
    assert np.isfinite(a).all() and np.abs(a).max() <= 1.0
    assert len(a) / 16000 > 0.8


def test_tts_call_contract():
    """Reference PiperTTSModel.__call__ contract: List[(text, int16 audio)]."""
    tts = FormantTTS(num_speakers=8)
    samples = tts(["hey buddy", ("hello there", 0.5)], num_samples=5, batch_size=2, seed=0)
    assert len(samples) == 5
    for text, audio in samples:
        assert isinstance(text, str)
        assert audio.dtype == np.int16
        assert len(audio) > 1000


def test_speech_sample_generator_yields_audio_dicts():
    gen = SpeechSampleGenerator("hey buddy", batch_size=4, seed=0, tts_backend="formant",
                                phrase_augment_prob=0.5)
    samples = list(gen(6))
    assert len(samples) == 6
    for sample in samples:
        assert sample["audio"]["sampling_rate"] == 16000
        assert len(sample["audio"]["array"]) > 1000
        assert "phrase" in sample


def test_sample_generator_traverses_speaker_and_settings_grids():
    """Chunked generation must advance the TTS grids across batches: without
    the offsets every batch rendered speaker pair (0, 0) at the first settings
    tuple, flattening all speaker/prosody diversity out of feature caches
    (round-3 root cause; grid traversal must match one long single call)."""
    calls = []
    orig = FormantTTS.synthesize_batch

    def spy(self, texts, speakers, slerp_weight, length_scale,
            noise_scale, noise_scale_w, seed):
        calls.append((list(speakers), slerp_weight, length_scale, noise_scale))
        return orig(self, texts, speakers, slerp_weight, length_scale,
                    noise_scale, noise_scale_w, seed)

    import heybuddy_tpu.models.tts as tts_mod

    old = tts_mod.FormantTTS.synthesize_batch
    tts_mod.FormantTTS.synthesize_batch = spy
    try:
        gen = SpeechSampleGenerator(
            "hey buddy", batch_size=4, seed=0, tts_backend="formant",
            phrase_augment_prob=0.0,
        )
        for _ in gen(24):
            pass
    finally:
        tts_mod.FormantTTS.synthesize_batch = old

    import itertools

    from heybuddy_tpu.constants import (
        DEFAULT_TTS_LENGTH_SCALES,
        DEFAULT_TTS_NOISE_SCALE_WEIGHTS,
        DEFAULT_TTS_NOISE_SCALES,
        DEFAULT_TTS_SLERP_WEIGHTS,
    )

    grid = list(itertools.product(
        DEFAULT_TTS_SLERP_WEIGHTS, DEFAULT_TTS_LENGTH_SCALES,
        DEFAULT_TTS_NOISE_SCALES, DEFAULT_TTS_NOISE_SCALE_WEIGHTS,
    ))
    assert len(calls) == 6
    for i, (speakers, slerp, length_scale, noise_scale) in enumerate(calls):
        # batch i renders settings tuple i and speaker pairs 4i..4i+3 —
        # exactly the traversal one long uninterrupted call would produce
        assert (slerp, length_scale, noise_scale) == grid[i][:3]
        assert speakers == [((4 * i + j) // 904 % 904, (4 * i + j) % 904)
                            for j in range(4)]
    settings = {(sl, ls, ns) for _, sl, ls, ns in calls}
    assert len(settings) > 2, settings


def test_formant_speaker_blending_varies_voice():
    """slerp interpolation must make the s2 grid axis vary the rendered
    voice (the old nearest-speaker pick collapsed every slerp<0.5 batch to
    s1, and s1 advances only once per 904 clips)."""
    from heybuddy_tpu.models.tts import _blend_speaker_params

    tts = FormantTTS(num_speakers=904)
    params = {
        s2: _blend_speaker_params(tts.synth, 0, s2, 0.25) for s2 in range(6)
    }
    f0s = {round(p[0], 3) for p in params.values()}
    assert len(f0s) > 3, f0s  # distinct voices even at slerp 0.25
    # and the rendered audio differs across s2 at fixed s1/settings/seed
    batch = tts.synthesize_batch(
        ["hey buddy"] * 3, [(0, 1), (0, 2), (0, 3)],
        slerp_weight=0.25, length_scale=1.0, noise_scale=0.667,
        noise_scale_w=1.0, seed=5,
    )
    assert not np.allclose(batch[0][: len(batch[1])], batch[1][: len(batch[0])])


def test_adversarial_generator_texts_exclude_phrase():
    gen = SpeechSampleGenerator(
        "hey buddy", adversarial=True, num_adversarial_texts=6, seed=1, tts_backend="formant"
    )
    texts = gen.get_adversarial_texts()
    assert texts and "hey buddy" not in texts


def test_phrase_augmentation_weighting():
    gen = SpeechSampleGenerator("hey buddy", phrase_augment_prob=0.75, tts_backend="formant")
    weighted = gen.get_texts()
    base = [t for t, w in weighted if w == 1.0]
    augmented = [(t, w) for t, w in weighted if w < 1.0]
    assert base == ["hey buddy"]
    assert len(augmented) == 100
    assert all(t.startswith("hey buddy. ") for t, _ in augmented)
    total_aug_weight = sum(w for _, w in augmented)
    assert abs(total_aug_weight - 0.75) < 1e-6


def test_vits_infer_shapes_tiny():
    import jax
    import functools
    from heybuddy_tpu.models.vits import VitsConfig, infer, init_params

    cfg = VitsConfig(n_speakers=4, gin_channels=32, n_layers=1, hidden_channels=96,
                     filter_channels=192, upsample_initial_channel=128)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(3, 50, (2, 16)).astype(np.int32)
    lengths = np.asarray([16, 10], np.int32)
    spk = np.asarray(params["emb_g"])[[0, 1]]
    fn = jax.jit(functools.partial(infer, max_frames=64, config=cfg))
    audio, audio_lengths = fn(params, jax.random.PRNGKey(1), ids, lengths, spk)
    assert audio.shape == (2, 64 * cfg.hop_samples)
    assert np.isfinite(np.asarray(audio)).all()
    assert (np.asarray(audio_lengths) > 0).all()


def test_vits_infer_non_sdp_tiny():
    import jax
    import functools
    from heybuddy_tpu.models.vits import VitsConfig, infer, init_params

    cfg = VitsConfig(n_speakers=4, gin_channels=32, n_layers=1, hidden_channels=96,
                     filter_channels=192, upsample_initial_channel=128, use_sdp=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "flows" not in params["dp"] and "conv_1" in params["dp"]
    ids = np.random.default_rng(0).integers(3, 50, (2, 16)).astype(np.int32)
    lengths = np.asarray([16, 10], np.int32)
    spk = np.asarray(params["emb_g"])[[0, 1]]
    fn = jax.jit(functools.partial(infer, max_frames=64, config=cfg))
    audio, audio_lengths = fn(params, jax.random.PRNGKey(1), ids, lengths, spk)
    assert audio.shape == (2, 64 * cfg.hop_samples)
    assert np.isfinite(np.asarray(audio)).all()
    assert (np.asarray(audio_lengths) > 0).all()


def test_feature_generator_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("HEYBUDDY_OFFLINE", "1")
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator

    gen = TrainingFeaturesGenerator(
        "hey buddy",
        directory=str(tmp_path),
        embed_batch_size=16,
        augment_batch_size=8,
        tts_batch_size=4,
        tts_backend="formant",
        num_adversarial_texts=4,
    )
    iterator = gen.get_training_features(8)
    assert iterator.precalculated.shape == (8, 16, 96)
    batch = iterator.take(4)
    assert batch.shape == (4, 16, 96)
    assert np.isfinite(batch).all()
    # cache hit must be instant and additive top-up must extend
    import time

    start = time.perf_counter()
    again = gen.get_training_features(8)
    assert time.perf_counter() - start < 2.0  # reference cache-latency bound
    assert len(again) == 8
    topped = gen.get_training_features(12)
    assert len(topped) == 12


def test_partial_phrase_features_and_iterator_wiring(tmp_path, monkeypatch):
    """Partial-view hard negatives: cache naming + negative-spec wiring."""
    monkeypatch.setenv("HEYBUDDY_OFFLINE", "1")
    import os

    from heybuddy_tpu.data.features import TrainingFeaturesGenerator
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator

    gen = TrainingFeaturesGenerator(
        "hey buddy",
        directory=str(tmp_path),
        embed_batch_size=16,
        augment_batch_size=8,
        tts_batch_size=4,
        tts_backend="formant",
        num_adversarial_texts=4,
    )
    partial = gen.get_partial_phrase_features(6)
    assert os.path.exists(tmp_path / "hey-buddy-partial.npy")
    assert partial.precalculated.shape == (6, 16, 96)
    assert np.isfinite(partial.take(3)).all()

    iterator = WakeWordTrainingDatasetIterator.default(
        "hey buddy",
        positive_samples=6,
        adversarial_samples=6,
        adversarial_phrases=4,
        positive_batch_size=3,
        adversarial_batch_size=3,
        negative_batch_size=0,
        partial_samples=6,
        partial_batch_size=3,
        num_batch_threads=1,
        directory=str(tmp_path),
        embed_batch_size=16,
        augment_batch_size=8,
        tts_batch_size=4,
        tts_backend="formant",
        num_adversarial_texts=4,
    )
    # three negative specs: adversarial + positive-partial + adversarial-partial
    assert len(iterator.negative) == 3
    import os as _os

    assert _os.path.exists(tmp_path / "hey-buddy-adversarial-partial.npy")
    x, y = next(iter(iterator))
    iterator.stop()
    assert x.shape[0] == y.shape[0] == 12  # 3 pos + 3 adv + 3+3 partial
    assert int(y.sum()) == 3  # partial views labeled negative


def test_default_iterator_reverb_positive_channel(tmp_path):
    """reverb_positive_samples adds a POSITIVE spec backed by the dedicated
    reverb-mode cache (the heybuddy train --reverb-positive-samples channel)."""
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator

    iterator = WakeWordTrainingDatasetIterator.default(
        "hey buddy",
        positive_samples=4,
        adversarial_samples=4,
        adversarial_phrases=4,
        positive_batch_size=2,
        adversarial_batch_size=2,
        negative_batch_size=0,
        reverb_positive_samples=4,
        num_batch_threads=1,
        directory=str(tmp_path),
        embed_batch_size=16,
        augment_batch_size=8,
        tts_batch_size=4,
        tts_backend="formant",
        num_adversarial_texts=4,
    )
    assert os.path.exists(tmp_path / "hey-buddy-reverb.npy")
    assert len(iterator.positive) == 2  # base positives + reverb mode
    x, y = next(iter(iterator))
    iterator.stop()
    # 2 pos + 1 reverb (batch positive_batch_size//2) + 2 adv rows
    assert x.shape[0] == y.shape[0] == 5
    assert int(y.sum()) == 3


def test_formant_tts_threaded_batch_matches_serial(monkeypatch):
    """HEYBUDDY_TTS_THREADS must not change outputs: per-clip explicit seeds
    make the threaded fan-out bit-identical to the serial path."""
    texts = ["hey buddy", "good morning", "turn it on", "hello there"]
    speakers = [(1, 2), (3, 4), (5, 6), (7, 8)]
    kwargs = dict(
        slerp_weight=0.3, length_scale=1.0, noise_scale=0.667,
        noise_scale_w=0.8, seed=11,
    )
    monkeypatch.setenv("HEYBUDDY_TTS_THREADS", "1")
    serial = FormantTTS().synthesize_batch(texts, speakers, **kwargs)
    monkeypatch.setenv("HEYBUDDY_TTS_THREADS", "3")
    threaded = FormantTTS().synthesize_batch(texts, speakers, **kwargs)
    assert len(serial) == len(threaded) == len(texts)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)
