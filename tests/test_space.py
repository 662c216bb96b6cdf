"""Feature-space coherence: sidecars, stale-cache regeneration, hosted-set
gating (VERDICT r1 missing #2 / next-round #3)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def fresh_embeddings(monkeypatch):
    """Reset the global featurizer singleton around each test."""
    import heybuddy_tpu.models.featurizer as featurizer

    monkeypatch.setattr(featurizer, "_GLOBAL_EMBEDDINGS", None)
    yield featurizer
    monkeypatch.setattr(featurizer, "_GLOBAL_EMBEDDINGS", None)


def test_sidecar_roundtrip(tmp_path, fresh_embeddings):
    from heybuddy_tpu.data.space import (
        active_space,
        read_space_sidecar,
        write_space_sidecar,
    )

    path = str(tmp_path / "feats.npy")
    np.save(path, np.zeros((2, 16, 96), np.float32))
    write_space_sidecar(path)
    sidecar = read_space_sidecar(path)
    assert sidecar == active_space()
    assert os.path.exists(str(tmp_path / "feats.space.json"))


def test_stale_cache_detected(tmp_path, fresh_embeddings):
    from heybuddy_tpu.data.space import check_cache_space, write_space_sidecar

    path = str(tmp_path / "feats.npy")
    np.save(path, np.zeros((2, 16, 96), np.float32))
    write_space_sidecar(path, {"space_id": "deadbeef00000000", "backend": "other"})
    assert not check_cache_space(path)
    # matching sidecar passes
    write_space_sidecar(path)
    assert check_cache_space(path)


def test_stale_cache_kept_with_env(tmp_path, fresh_embeddings, monkeypatch):
    from heybuddy_tpu.data.space import check_cache_space, write_space_sidecar

    path = str(tmp_path / "feats.npy")
    np.save(path, np.zeros((2, 16, 96), np.float32))
    write_space_sidecar(path, {"space_id": "deadbeef00000000", "backend": "other"})
    monkeypatch.setenv("HEYBUDDY_KEEP_STALE_FEATURES", "1")
    assert check_cache_space(path)


def test_legacy_cache_without_sidecar_is_stamped(tmp_path, fresh_embeddings):
    from heybuddy_tpu.data.space import check_cache_space, read_space_sidecar, active_space

    path = str(tmp_path / "feats.npy")
    np.save(path, np.zeros((2, 16, 96), np.float32))
    assert check_cache_space(path)
    assert read_space_sidecar(path) == active_space()


def test_tts_provenance_invalidates_cache(tmp_path, fresh_embeddings, monkeypatch):
    """Same embedding space, different synthesis source -> stale."""
    from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

    monkeypatch.delenv("HEYBUDDY_KEEP_STALE_FEATURES", raising=False)
    path = str(tmp_path / "feats.npy")
    np.save(path, np.zeros((2, 16, 96), np.float32))
    write_space_sidecar(path, active_space("formant"))
    assert check_cache_space(path, "formant")
    assert not check_cache_space(path, "formant-device")
    write_space_sidecar(path, active_space("formant-device"))
    assert check_cache_space(path, "formant-device")


def test_legacy_sidecar_without_tts_field(tmp_path, fresh_embeddings, monkeypatch):
    """Pre-provenance sidecars were all produced under sampling v1 (the
    speaker-collapse traversal), so they are stale for EVERY current backend
    and regenerate."""
    from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

    monkeypatch.delenv("HEYBUDDY_KEEP_STALE_FEATURES", raising=False)
    monkeypatch.delenv("HEYBUDDY_TTS_BACKEND", raising=False)
    path = str(tmp_path / "feats.npy")
    np.save(path, np.zeros((2, 16, 96), np.float32))
    legacy = {k: v for k, v in active_space().items() if k != "tts"}
    write_space_sidecar(path, legacy)
    assert not check_cache_space(path)
    np.save(path, np.zeros((2, 16, 96), np.float32))
    write_space_sidecar(path)  # current provenance
    assert check_cache_space(path)
    assert not check_cache_space(path, "formant-device")


def test_hosted_sets_disabled_for_trunkpool(fresh_embeddings, monkeypatch):
    monkeypatch.delenv("HEYBUDDY_ALLOW_SPACE_MISMATCH", raising=False)
    from heybuddy_tpu.data.space import hosted_sets_compatible

    # default backend is the re-designed trunk+pool net -> not the Google space
    assert not hosted_sets_compatible("test")
    monkeypatch.setenv("HEYBUDDY_ALLOW_SPACE_MISMATCH", "1")
    assert hosted_sets_compatible("test")


def test_hosted_name_with_matching_local_sidecar_allowed(
    tmp_path, fresh_embeddings, monkeypatch
):
    """A locally-generated validation.npy in our own space stays usable."""
    monkeypatch.delenv("HEYBUDDY_ALLOW_SPACE_MISMATCH", raising=False)
    from heybuddy_tpu.data.space import hosted_sets_compatible, write_space_sidecar

    path = str(tmp_path / "validation.npy")
    np.save(path, np.zeros((4, 17, 96), np.float32))
    write_space_sidecar(path)
    assert hosted_sets_compatible("test", local_path=path)


def test_hosted_negative_returns_none_on_mismatch(fresh_embeddings, monkeypatch):
    monkeypatch.delenv("HEYBUDDY_ALLOW_SPACE_MISMATCH", raising=False)
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator

    assert WakeWordTrainingDatasetIterator._hosted_negative("hey buddy") is None


def test_feature_cache_regenerates_on_space_change(tmp_path, fresh_embeddings, monkeypatch):
    """_get_features removes a cache produced by a different embedding."""
    monkeypatch.setenv("HEYBUDDY_DATASET_DIR", str(tmp_path))
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator
    from heybuddy_tpu.data.space import write_space_sidecar
    from heybuddy_tpu.models.featurizer import get_speech_embeddings

    # seed a "foreign" cache for the phrase
    gen = TrainingFeaturesGenerator(phrase="space test")
    name = gen._cache_name(False, False, True)
    path = os.path.join(str(tmp_path), f"{name}.npy")
    np.save(path, np.zeros((3, 16, 96), np.float32))
    write_space_sidecar(path, {"space_id": "deadbeef00000000", "backend": "other"})

    it = gen.get_validation_features(2)
    assert len(it) >= 2
    with open(os.path.splitext(path)[0] + ".space.json") as f:
        assert json.load(f)["space_id"] == get_speech_embeddings().space_id
