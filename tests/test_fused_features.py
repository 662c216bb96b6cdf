"""
Fused device feature pipeline: plans -> render -> augment -> featurize in one
compiled program (models/formant_device.fused_features_batch wired through
TrainingFeaturesGenerator._featurize_plan_stream).
"""

import numpy as np
import pytest

L_MAX = 24000
HARMONICS = 48


@pytest.fixture()
def device_tts(monkeypatch):
    """Plant a small-shape DeviceFormantTTS as the cached backend instance so
    CPU test compiles stay fast (the default 48000x100 render program is a
    multi-minute CPU compile)."""
    import heybuddy_tpu.models.tts as tts_mod

    tts = tts_mod.DeviceFormantTTS(max_samples=L_MAX, harmonics=HARMONICS)
    monkeypatch.setitem(tts_mod._GLOBAL_TTS, "formant-device", tts)
    return tts


def test_center_place_matches_host_pad_only():
    import jax.numpy as jnp

    from heybuddy_tpu.models.formant_device import _center_place

    target = 64
    clip = np.zeros((2, target), np.float32)
    clip[0, :10] = np.arange(1, 11)
    clip[1, :33] = 1.0
    lengths = np.array([10, 33], np.int32)
    out = np.asarray(_center_place(jnp.asarray(clip), jnp.asarray(lengths), target))
    # host reference: centered placement
    expect = np.zeros_like(clip)
    for i, n in enumerate(lengths):
        off = (target - n) // 2
        expect[i, off:off + n] = clip[i, :n]
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_fused_generate_counts_shape_and_sidecar(tmp_path, device_tts):
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator
    from heybuddy_tpu.data.space import read_space_sidecar

    gen = TrainingFeaturesGenerator(
        "hey buddy", directory=str(tmp_path), seed=3,
        tts_backend="formant-device", tts_batch_size=6,
        augment_batch_size=8, embed_batch_size=8,
    )
    assert gen._use_fused_pipeline()
    gen.get_training_features(14)
    feats = np.load(str(tmp_path / "hey-buddy.npy"))
    assert feats.shape == (14, 16, 96)
    assert np.isfinite(feats).all()
    assert feats.std() > 0.01
    sidecar = read_space_sidecar(str(tmp_path / "hey-buddy.npy"))
    assert sidecar["tts"].startswith("formant-device:")


def test_fused_generate_deterministic(tmp_path, device_tts):
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator

    outs = []
    for sub in ("a", "b"):
        d = tmp_path / sub
        gen = TrainingFeaturesGenerator(
            "hey buddy", directory=str(d), seed=7,
            tts_backend="formant-device", tts_batch_size=6,
            augment_batch_size=8, embed_batch_size=8,
        )
        gen.get_training_features(10)
        outs.append(np.load(str(d / "hey-buddy.npy")))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_fused_pad_only_validation(tmp_path, device_tts):
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator

    gen = TrainingFeaturesGenerator(
        "hey buddy", directory=str(tmp_path), seed=5,
        tts_backend="formant-device", tts_batch_size=6,
        augment_batch_size=8, embed_batch_size=8,
    )
    gen.get_validation_features(6)
    feats = np.load(str(tmp_path / "hey-buddy-validation.npy"))
    assert feats.shape == (6, 16, 96)
    assert np.isfinite(feats).all()


def test_fused_handles_host_fallback_clips(tmp_path, device_tts):
    """Phrases too long for the compiled render shape come back as host
    audio and flow through the classic path; counts still add up."""
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator

    long_phrase = " ".join(["fundamental counterrevolutionaries"] * 6)
    gen = TrainingFeaturesGenerator(
        [long_phrase, "hey buddy"], directory=str(tmp_path), seed=11,
        tts_backend="formant-device", tts_batch_size=4,
        augment_batch_size=4, embed_batch_size=4,
    )
    gen.get_training_features(8)
    feats = np.load(
        str(tmp_path / (gen._cache_name(False, False, False) + ".npy")))
    assert feats.shape[0] == 8
    assert np.isfinite(feats).all()


def test_pretrain_pool_via_plan_batches(device_tts):
    """build_clip_pool's plan-batched fast path fills the pool with distinct,
    nonzero renderings when the TTS backend supports plans."""
    from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer

    pre = EmbeddingPretrainer(
        texts=["hey buddy", "good morning", "open door"],
        speakers_per_text=2, batch_size=2, seed=4,
        tts_backend="formant-device",
    )
    pre.build_clip_pool()
    pool, lengths = pre._pool, pre._pool_lengths
    assert pool.shape[:2] == (3, 2)
    assert (lengths > 2000).all()
    # different speaker renderings of the same text differ
    assert not np.allclose(pool[0, 0], pool[0, 1])
    assert np.abs(pool).max() > 0.2


def test_fused_env_kill_switch(tmp_path, device_tts, monkeypatch):
    from heybuddy_tpu.data.features import TrainingFeaturesGenerator

    monkeypatch.setenv("HEYBUDDY_FUSED_TTS", "0")
    gen = TrainingFeaturesGenerator(
        "hey buddy", directory=str(tmp_path), seed=3,
        tts_backend="formant-device",
    )
    assert not gen._use_fused_pipeline()
