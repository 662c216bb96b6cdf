"""Featurization shape contracts (mirrors reference tests/test_embeddings.py)."""

import numpy as np

from heybuddy_tpu.models.featurizer import SpeechEmbeddings, get_speech_embeddings
from heybuddy_tpu.ops.windows import embedding_window_starts, num_embedding_windows


def test_speech_embeddings_shapes():
    speech_embeddings = get_speech_embeddings()
    audio = np.random.default_rng(0).normal(0, 0.1, (17280,)).astype(np.float32)
    embeddings, spectrogram = speech_embeddings(audio, return_spectrograms=True)
    assert spectrogram.shape == (1, 100, 32)
    assert embeddings.shape == (1, 4, 96)

    audio = np.random.default_rng(1).normal(0, 0.1, (23040,)).astype(np.float32)
    embeddings, spectrogram = speech_embeddings(audio, return_spectrograms=True)
    assert spectrogram.shape == (1, 420, 32)
    assert embeddings.shape == (1, 16, 96)


def test_window_start_plan():
    # The reference's 4 audio windows x 4 embedding offsets, in emission order.
    assert embedding_window_starts(23040) == (
        0, 8, 16, 24, 12, 20, 28, 36, 24, 32, 40, 48, 36, 44, 52, 60,
    )
    assert num_embedding_windows(23040) == 16
    assert num_embedding_windows(17280) == 4


def test_embeddings_deterministic_and_batched():
    se = SpeechEmbeddings()
    rng = np.random.default_rng(2)
    audio = rng.normal(0, 0.1, (5, 23040)).astype(np.float32)
    a = se(audio)
    b = se(audio)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (5, 16, 96)
    single = se(audio[2])
    np.testing.assert_allclose(a[2], single[0], rtol=2e-3, atol=2e-3)


def test_nan_repair():
    emb = np.zeros((4, 16, 96), dtype=np.float32)
    emb[1] = np.nan
    repaired = SpeechEmbeddings._repair_nan(emb)
    assert not np.isnan(repaired).any()
    all_nan = np.full((2, 16, 96), np.nan, dtype=np.float32)
    assert (SpeechEmbeddings._repair_nan(all_nan) == 0).all()
