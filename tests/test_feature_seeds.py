"""Seed-namespace disjointness across feature-cache kinds (ADVICE r2 medium):
the validation caches feeding the trainer's negative-weight controller must
never share TTS/augment seeds with the held-out testing caches."""

import os

import numpy as np
import pytest

from heybuddy_tpu.data.features import _SEED_NAMESPACE, TrainingFeaturesGenerator


def _record_offsets(monkeypatch, gen):
    offsets = []

    def fake_generate(self, num_samples, adversarial=False, pad_only=False,
                      store=None, adversarial_phrases=None, seed_offset=0):
        offsets.append(seed_offset)
        store.append(np.zeros((num_samples, 16, 96), np.float32))
        return num_samples

    monkeypatch.setattr(TrainingFeaturesGenerator, "generate", fake_generate)
    return offsets


@pytest.mark.parametrize(
    "testing,validation,block",
    [
        (False, False, 0),  # augmented training
        (True, False, 1),   # augmented held-out testing
        (False, True, 7),   # pad-only validation (controller feedback)
        (True, True, 8),    # pad-only held-out clean set
    ],
)
def test_feature_kind_seed_blocks_disjoint(tmp_path, monkeypatch, testing,
                                           validation, block):
    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    gen = TrainingFeaturesGenerator(phrase="seed probe", directory=str(tmp_path))
    offsets = _record_offsets(monkeypatch, gen)
    gen._get_features(4, adversarial=False, testing=testing, validation=validation)
    assert offsets, "generate was never called"
    for off in offsets:
        assert off // _SEED_NAMESPACE == block


def test_validation_and_testing_never_share_seeds(tmp_path, monkeypatch):
    """The exact ADVICE scenario: testing-validation (controller) vs
    testing-augmented (reported metrics) draw from disjoint seed blocks even
    as both caches grow from offset 0."""
    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    gen = TrainingFeaturesGenerator(phrase="seed probe 2", directory=str(tmp_path))
    offsets = _record_offsets(monkeypatch, gen)
    gen._get_features(8, adversarial=False, testing=True, validation=True)
    val_offsets = set(offsets)
    offsets.clear()
    gen._get_features(8, adversarial=False, testing=True, validation=False)
    test_offsets = set(offsets)
    assert not (val_offsets & test_offsets)


def test_stream_window_cache_honors_use_cache(tmp_path, monkeypatch):
    """use_cache=False must discard existing stream-window shards (ADVICE low)."""
    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    from heybuddy_tpu.data.space import write_space_sidecar
    from heybuddy_tpu.utils.strings import safe_name

    phrase = "stream cache probe"
    seed = 0
    name = f"negative-speech-stream-{seed}-x{safe_name(phrase)}"
    path = os.path.join(str(tmp_path), f"{name}.npy")
    np.save(path, np.zeros((3, 16, 96), np.float32))
    write_space_sidecar(path)

    gen = TrainingFeaturesGenerator(
        phrase=phrase, directory=str(tmp_path), use_cache=False, seed=seed
    )
    # the stale 3-row cache is removed up front; with 0 rows requested nothing
    # is regenerated, so the resulting iterator has no backing file
    with pytest.raises(FileNotFoundError):
        gen.get_stream_window_features(0, adversarial=False)
    assert not os.path.exists(path)

    # and with use_cache=True the same pre-seeded cache is kept
    np.save(path, np.zeros((3, 16, 96), np.float32))
    write_space_sidecar(path)
    gen2 = TrainingFeaturesGenerator(
        phrase=phrase, directory=str(tmp_path), use_cache=True, seed=seed
    )
    it2 = gen2.get_stream_window_features(2, adversarial=False)
    assert len(it2) == 3


def _patch_featurize(monkeypatch):
    """Run the REAL generate() (so the texts sidecar is recorded) but skip
    TTS/augment/featurization — append zero rows instead."""

    def fake_featurize(self, samples, pad_only=False, store=None, limit=0,
                       seed_offset=0, config=None):
        store.append(np.zeros((limit, 16, 96), np.float32))
        return limit

    monkeypatch.setattr(
        TrainingFeaturesGenerator, "_featurize_stream", fake_featurize
    )
    monkeypatch.setattr(
        TrainingFeaturesGenerator, "_featurize_plan_stream", fake_featurize
    )


def test_adversarial_texts_match_rendered_pool(tmp_path, monkeypatch):
    """ADVICE r4 medium: far_attribution claimed to score the held-out pool's
    exact texts but re-derived them from the base seed (16/60 overlap). The
    texts sidecar must record the pool generate() actually rendered, and
    adversarial_texts() must return it."""
    from heybuddy_tpu.data.features import _texts_sidecar_path
    from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator

    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    _patch_featurize(monkeypatch)
    gen = TrainingFeaturesGenerator(
        phrase="hey buddy", directory=str(tmp_path), seed=11
    )
    gen.get_training_features(4, adversarial=True, adversarial_phrases=12,
                              testing=True)

    # The pool the chunk's SpeechSampleGenerator drew (same seed arithmetic
    # generate() used: base + existing(0) + testing namespace block).
    expected = SpeechSampleGenerator(
        "hey buddy", adversarial=True, seed=11 + _SEED_NAMESPACE * 1,
        num_adversarial_texts=12,
    ).get_adversarial_texts()

    name = gen._cache_name(True, True, False)
    sidecar = _texts_sidecar_path(os.path.join(str(tmp_path), f"{name}.npy"))
    assert os.path.exists(sidecar)
    got = gen.adversarial_texts(testing=True, adversarial_phrases=12)
    assert sorted(got) == sorted(expected)

    # A top-up chunk draws a DIFFERENT pool (seed advances by existing rows);
    # the sidecar must accumulate the union, not overwrite.
    gen.get_training_features(8, adversarial=True, adversarial_phrases=12,
                              testing=True)
    topped = SpeechSampleGenerator(
        "hey buddy", adversarial=True, seed=11 + 4 + _SEED_NAMESPACE * 1,
        num_adversarial_texts=12,
    ).get_adversarial_texts()
    union = gen.adversarial_texts(testing=True, adversarial_phrases=12)
    assert set(expected) <= set(union)
    assert set(topped) <= set(union)


def test_adversarial_texts_fallback_without_sidecar(tmp_path, monkeypatch):
    """Pre-sidecar caches: derive the first chunk's pool from the cache-kind
    seed block (exact for any cache built in one run)."""
    from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator

    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    gen = TrainingFeaturesGenerator(
        phrase="hey buddy", directory=str(tmp_path), seed=7
    )
    expected = SpeechSampleGenerator(
        "hey buddy", adversarial=True, seed=7 + _SEED_NAMESPACE * 1,
        num_adversarial_texts=9,
    ).get_adversarial_texts()
    got = gen.adversarial_texts(testing=True, adversarial_phrases=9)
    assert sorted(got) == sorted(expected)


def test_stale_cache_removal_drops_texts_sidecar(tmp_path, monkeypatch):
    """use_cache=False must remove the texts sidecar with the .npy, or a
    regenerated cache would report a union polluted by the discarded pool."""
    from heybuddy_tpu.data.features import _texts_sidecar_path

    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    _patch_featurize(monkeypatch)
    gen = TrainingFeaturesGenerator(
        phrase="hey buddy", directory=str(tmp_path), seed=3
    )
    gen.get_training_features(2, adversarial=True, adversarial_phrases=6,
                              testing=True)
    name = gen._cache_name(True, True, False)
    path = os.path.join(str(tmp_path), f"{name}.npy")
    sidecar = _texts_sidecar_path(path)
    assert os.path.exists(sidecar)

    gen2 = TrainingFeaturesGenerator(
        phrase="hey buddy", directory=str(tmp_path), seed=3, use_cache=False
    )
    gen2.get_training_features(2, adversarial=True, adversarial_phrases=6,
                               testing=True)
    # sidecar was rebuilt fresh (removed with the stale npy, re-recorded)
    import json
    with open(sidecar) as f:
        texts = json.load(f)
    from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator
    expected = SpeechSampleGenerator(
        "hey buddy", adversarial=True, seed=3 + _SEED_NAMESPACE * 1,
        num_adversarial_texts=6,
    ).get_adversarial_texts()
    assert sorted(texts) == sorted(expected)


def test_reverb_positive_features_use_block_9(tmp_path, monkeypatch):
    """The new reverb-positive cache kind must live in its own seed block
    (9/10) and pin the reverb+mid-SNR augment mode."""
    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    gen = TrainingFeaturesGenerator(phrase="reverb probe", directory=str(tmp_path))
    seen = {}

    def fake_featurize(self, samples, pad_only=False, store=None, limit=0,
                       seed_offset=0, config=None):
        seen["offset"] = seed_offset
        seen["config"] = config
        store.append(np.zeros((limit, 16, 96), np.float32))
        return limit

    monkeypatch.setattr(
        TrainingFeaturesGenerator, "_featurize_stream", fake_featurize
    )
    monkeypatch.setattr(
        TrainingFeaturesGenerator, "_featurize_plan_stream", fake_featurize
    )
    it = gen.get_reverb_positive_features(4)
    assert len(it.precalculated) == 4
    assert seen["offset"] // _SEED_NAMESPACE == 9
    cfg = seen["config"]
    assert cfg.reverb_prob == 1.0
    assert cfg.background_noise_prob == 1.0
    assert cfg.background_noise_min_snr_db == 0.0
    assert cfg.pitch_shift_prob == 0.0 and cfg.seven_band_prob == 0.0
