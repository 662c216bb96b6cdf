"""Continuous-stream synthesis and sliding-window negative features."""

import numpy as np

from heybuddy_tpu.constants import CLIP_SAMPLES
from heybuddy_tpu.data.streams import (
    RUNTIME_WINDOW_STRIDE,
    stream_window_clips,
    synth_adversarial_stream,
    synth_speech_stream,
)


def test_speech_stream_contract():
    stream = synth_speech_stream(0.1, seed=3, exclude_phrase="hey buddy",
                                 tts_backend="formant")
    assert stream.dtype == np.float32
    assert len(stream) == int(0.1 * 60 * 16000)
    assert np.abs(stream).max() <= 1.0
    # speech actually present (not silence/noise only)
    assert np.abs(stream).max() > 0.05
    # deterministic per seed
    again = synth_speech_stream(0.1, seed=3, exclude_phrase="hey buddy",
                                tts_backend="formant")
    np.testing.assert_array_equal(stream, again)


def test_adversarial_stream_contract():
    stream = synth_adversarial_stream("hey buddy", 0.1, seed=5,
                                      tts_backend="formant")
    assert stream.dtype == np.float32 and len(stream) == int(0.1 * 60 * 16000)


def test_collision_salad_stream_contract():
    from heybuddy_tpu.data.streams import synth_collision_salad_stream

    stream, schedule = synth_collision_salad_stream(
        "hey buddy", 0.1, seed=7, tts_backend="formant", return_schedule=True
    )
    assert stream.dtype == np.float32 and len(stream) == int(0.1 * 60 * 16000)
    # salads never contain the phrase's own words (negative stream must not
    # plant true positives), and DO contain neighbor vocabulary
    from heybuddy_tpu.text.adversarial import get_adversarial_text_generator

    neighbors = set()
    for w in "hey buddy".split():
        neighbors.update(get_adversarial_text_generator().adversarial_words(w))
    text_words = set()
    for _, _, text in schedule:
        text_words.update(text.split())
    assert not text_words & {"hey", "buddy"}
    assert text_words & neighbors


def test_stream_window_clips_positions():
    stream = np.arange(CLIP_SAMPLES + 2 * RUNTIME_WINDOW_STRIDE, dtype=np.float32)
    clips = stream_window_clips(stream)
    assert clips.shape == (3, CLIP_SAMPLES)
    np.testing.assert_array_equal(clips[1], stream[RUNTIME_WINDOW_STRIDE:][:CLIP_SAMPLES])
    assert stream_window_clips(np.zeros(10, np.float32)).shape == (0, CLIP_SAMPLES)


def test_stream_window_features_cached(tmp_path):
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator

    gen = TrainingFeaturesGenerator(
        "hey buddy", directory=str(tmp_path), tts_backend="formant", seed=0
    )
    it = gen.get_stream_window_features(6)
    feats = it.precalculated[:]
    assert feats.shape == (6, 16, 96)
    assert np.isfinite(feats).all()
    # cache hit: second call returns the same rows without regenerating
    again = gen.get_stream_window_features(6).precalculated[:]
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(again))
    # adversarial variant uses a separate cache
    adv = gen.get_stream_window_features(4, adversarial=True).precalculated[:]
    assert adv.shape == (4, 16, 96)
    # collision-salad variant: separate cache, same contract
    coll = gen.get_stream_window_features(4, collision=True).precalculated[:]
    assert coll.shape == (4, 16, 96)
    assert not np.array_equal(np.asarray(coll), np.asarray(adv))


def test_validation_iterator_uses_disjoint_testing_cache(tmp_path, monkeypatch):
    """The plain validation cache doubles as clean-positive TRAINING coverage
    (default()'s clean_positive_samples path), so the validation iterator must
    draw from the disjoint testing-validation cache — otherwise the trainer's
    fp-per-hour controller validates recall on samples the model trained on."""
    monkeypatch.setenv("HEYBUDDY_OFFLINE", "1")
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator

    WakeWordTrainingDatasetIterator.validation(
        "hey buddy",
        validation_samples=4,
        stream_negative_samples=0,
        num_batch_threads=1,
        directory=str(tmp_path),
        tts_backend="formant",
        seed=0,
    )
    assert (tmp_path / "hey-buddy-testing-validation.npy").exists()
    assert not (tmp_path / "hey-buddy-validation.npy").exists()
