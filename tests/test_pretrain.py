"""Embedding pre-training: NT-Xent loss properties and a tiny training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer, nt_xent_loss


def test_nt_xent_perfect_alignment_low_loss():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(16, 96)).astype(np.float32))
    aligned = float(nt_xent_loss(z, z, temperature=0.1))
    shuffled = jnp.asarray(np.roll(np.asarray(z), 1, axis=0))
    misaligned = float(nt_xent_loss(z, shuffled, temperature=0.1))
    assert aligned < 0.1
    assert misaligned > aligned + 1.0


def test_nt_xent_collapse_value():
    # identical embeddings for every sample -> uniform softmax -> ln(2b-1)
    z = jnp.ones((8, 96))
    loss = float(nt_xent_loss(z, z))
    assert abs(loss - np.log(2 * 8 - 1)) < 1e-3


@pytest.mark.slow
def test_pretrainer_step_updates_params(tmp_path, monkeypatch):
    monkeypatch.setenv("HEYBUDDY_OFFLINE", "1")
    pretrainer = EmbeddingPretrainer(
        num_texts=8, speakers_per_text=2, batch_size=4, tts_backend="formant", seed=0
    )
    before = np.asarray(pretrainer.params["patch_proj"]["w"]).copy()
    pretrainer.train(steps=2, log_every=1)
    after = np.asarray(pretrainer.params["patch_proj"]["w"])
    assert not np.allclose(before, after)
    path = str(tmp_path / "emb.npz")
    pretrainer.save(path)

    warm = EmbeddingPretrainer(
        num_texts=8, speakers_per_text=2, batch_size=4, tts_backend="formant",
        seed=1, init_weights=path,
    )
    np.testing.assert_allclose(np.asarray(warm.params["patch_proj"]["w"]), after, atol=1e-7)


def test_default_texts_adversarial_clusters():
    from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer

    texts = EmbeddingPretrainer._default_texts(64, 0, adversarial_fraction=0.5)
    assert len(texts) == 64
    plain = EmbeddingPretrainer._default_texts(64, 0)
    assert len(plain) == 64
    # deterministic for a given seed
    assert texts == EmbeddingPretrainer._default_texts(64, 0, adversarial_fraction=0.5)
    # the non-cluster prefix matches between fractions (same rng stream)
    assert texts[:16] == plain[:16]
