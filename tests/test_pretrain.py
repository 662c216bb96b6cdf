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

    texts, ids = EmbeddingPretrainer._default_texts(64, 0, adversarial_fraction=0.5)
    assert len(texts) == 64 and len(ids) == 64
    plain, plain_ids = EmbeddingPretrainer._default_texts(64, 0)
    assert len(plain) == 64
    assert (plain_ids == -1).all()
    # deterministic for a given seed
    texts2, ids2 = EmbeddingPretrainer._default_texts(64, 0, adversarial_fraction=0.5)
    assert texts == texts2 and (ids == ids2).all()
    # the non-cluster prefix matches between fractions (same rng stream)
    assert texts[:16] == plain[:16]
    # cluster members are contiguous groups of >= 2 distinct texts
    for cid in np.unique(ids[ids >= 0]):
        members = [texts[i] for i in np.flatnonzero(ids == cid)]
        assert len(members) >= 2
        assert len(set(members)) == len(members)


def test_default_texts_focus_phrase_cluster():
    from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer

    texts, ids = EmbeddingPretrainer._default_texts(
        64, 0, adversarial_fraction=0.25, focus_phrase="hey buddy"
    )
    assert texts[0] == "hey buddy"
    focus = [texts[i] for i in np.flatnonzero(ids == 0)]
    assert len(focus) >= 4  # phrase + near-collisions
    assert "hey buddy" in focus
    # neighbors are distinct from the phrase
    assert len(set(focus)) == len(focus)


def test_default_texts_focus_swap_depth():
    """focus_swap_depth extends cluster 0 with single-swap collision texts
    and leaves the default (depth 0) pool byte-identical (the bundled v7
    embedding's reproduce command must keep producing v7)."""
    from heybuddy_tpu.text.adversarial import single_swap_collision_texts
    from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer

    base, base_ids = EmbeddingPretrainer._default_texts(
        64, 0, adversarial_fraction=0.25, focus_phrase="hey buddy"
    )
    deep, deep_ids = EmbeddingPretrainer._default_texts(
        64, 0, adversarial_fraction=0.25, focus_phrase="hey buddy",
        focus_swap_depth=8,
    )
    base_focus = {base[i] for i in np.flatnonzero(base_ids == 0)}
    deep_focus = {deep[i] for i in np.flatnonzero(deep_ids == 0)}
    added = deep_focus - base_focus
    assert added, "swap depth must grow the focus cluster"
    swaps = set(single_swap_collision_texts("hey buddy", num_samples=8, seed=991))
    # every added text is a single-swap collision drawn by the same seeded call
    assert added <= swaps, added - swaps
    # depth 0 reproduces the original pool exactly
    again, again_ids = EmbeddingPretrainer._default_texts(
        64, 0, adversarial_fraction=0.25, focus_phrase="hey buddy"
    )
    assert again == base and np.array_equal(again_ids, base_ids)


def test_hard_pair_margin_loss_properties():
    from heybuddy_tpu.training.embedding_pretrain import hard_pair_margin_loss

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    no_pairs = jnp.zeros((4, 4), dtype=bool)
    assert float(hard_pair_margin_loss(z, z, no_pairs)) == 0.0

    # identical pair above margin -> positive loss; well-separated pair -> 0
    close = jnp.asarray(np.tile(rng.normal(size=(1, 8)), (4, 1)).astype(np.float32))
    mask = jnp.zeros((4, 4), dtype=bool).at[0, 1].set(True).at[1, 0].set(True)
    loss_close = float(hard_pair_margin_loss(close, close, mask, margin=0.4))
    assert loss_close > 0.1

    apart = np.zeros((4, 8), np.float32)
    apart[0, 0] = 1.0
    apart[1, 1] = 1.0  # orthogonal -> cosine 0 < margin
    loss_apart = float(hard_pair_margin_loss(
        jnp.asarray(apart), jnp.asarray(apart), mask, margin=0.4))
    assert loss_apart == 0.0


def test_sample_batch_guarantees_cluster_cooccurrence(monkeypatch):
    monkeypatch.setenv("HEYBUDDY_OFFLINE", "1")
    pretrainer = EmbeddingPretrainer(
        num_texts=64, speakers_per_text=2, batch_size=16, tts_backend="formant",
        adversarial_fraction=0.5, focus_phrase="hey buddy", seed=0,
    )
    members = {}
    for cid in np.unique(pretrainer.cluster_ids):
        if cid >= 0:
            members[int(cid)] = np.flatnonzero(pretrainer.cluster_ids == cid)
    batch = pretrainer._sample_batch(members, len(pretrainer.texts))
    assert len(batch) == 16
    assert len(set(batch.tolist())) == 16  # no duplicate texts in-batch
    # the focus cluster is fully present (capped at batch//2)
    focus = set(members[0][: 16 // 2].tolist())
    assert focus <= set(batch.tolist())
    # at least one regular cluster co-occurs in full
    ids = pretrainer.cluster_ids[batch]
    regular = [cid for cid in members if cid != 0]
    full = [cid for cid in regular
            if set(members[cid].tolist()) <= set(batch.tolist())]
    assert full, "no regular cluster fully co-occurred in the batch"
