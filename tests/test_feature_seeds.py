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
