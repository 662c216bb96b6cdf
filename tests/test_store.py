"""Appendable .npy store and precalculated dataset iterator."""

import os

import numpy as np
import pytest

from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator
from heybuddy_tpu.utils.npy import AppendableNpyFile, ensure_appendable, read_npy_header


def test_appendable_npy_roundtrip(tmp_path):
    path = str(tmp_path / "features.npy")
    store = AppendableNpyFile(path)
    a = np.random.default_rng(0).normal(size=(10, 16, 96)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(7, 16, 96)).astype(np.float32)
    store.append(a)
    store.append(b)
    assert store.shape == (17, 16, 96)
    loaded = np.load(path, mmap_mode="r")
    assert loaded.shape == (17, 16, 96)
    np.testing.assert_array_equal(np.asarray(loaded[:10]), a)
    np.testing.assert_array_equal(np.asarray(loaded[10:]), b)


def test_appendable_npy_reopen_and_append(tmp_path):
    path = str(tmp_path / "grow.npy")
    AppendableNpyFile(path).append(np.zeros((5, 4), dtype=np.float32))
    store = AppendableNpyFile(path)
    store.append(np.ones((3, 4), dtype=np.float32))
    loaded = np.load(path)
    assert loaded.shape == (8, 4)
    assert (loaded[5:] == 1).all()


def test_truncated_write_recovery(tmp_path):
    path = str(tmp_path / "crash.npy")
    store = AppendableNpyFile(path)
    store.append(np.arange(40, dtype=np.float32).reshape(10, 4))
    # Simulate a crash mid-append: write half a row of garbage.
    with open(path, "ab") as f:
        f.write(b"\x00" * 7)
    ensure_appendable(path)
    dtype, shape, _ = read_npy_header(path)
    assert shape == (10, 4)
    loaded = np.load(path)
    assert loaded.shape == (10, 4)


def test_precalculated_take_wraparound(tmp_path):
    data = np.arange(5 * 2 * 3, dtype=np.float32).reshape(5, 2, 3)
    it = PrecalculatedDatasetIterator.from_array(data, "small", directory=str(tmp_path), seed=0)
    first = it.take(3)
    second = it.take(4)  # wraps: 2 remaining + reshuffled 2
    assert first.shape == (3, 2, 3)
    assert second.shape == (4, 2, 3)
    assert it.total_taken == 7


def test_precalculated_ordered(tmp_path):
    data = np.arange(4 * 1 * 2, dtype=np.float32).reshape(4, 1, 2)
    it = PrecalculatedDatasetIterator.from_array(data, "ordered", directory=str(tmp_path), ordered=True)
    np.testing.assert_array_equal(it.take(2), data[:2])
    np.testing.assert_array_equal(it.take(2), data[2:])


def test_labeled_strips_token_row(tmp_path):
    data = np.random.default_rng(2).normal(size=(6, 17, 96)).astype(np.float32)
    it = PrecalculatedDatasetIterator.from_array(
        data, "labeled", directory=str(tmp_path), labeled=True
    )
    batch = it.take(4)
    assert batch.shape == (4, 16, 96)


def test_labeled_exclude_phrase_filters(tmp_path):
    from heybuddy_tpu.text.tokens import BERTTokenizer

    tokenizer = BERTTokenizer()
    phrase_tokens = np.asarray(tokenizer("hello world")).flatten().astype(np.float32)
    data = np.random.default_rng(3).normal(size=(8, 17, 96)).astype(np.float32)
    # Rows 0-3 carry the excluded phrase's tokens; 4-7 carry disjoint ids.
    data[:4, 16, : len(phrase_tokens)] = phrase_tokens
    data[4:, 16, :] = 99999.0
    it = PrecalculatedDatasetIterator.from_array(
        data, "excl", directory=str(tmp_path), labeled=True, exclude_phrase="hello world"
    )
    batch = it.take(4)
    assert batch.shape == (4, 16, 96)
    # Every returned row must match one of the non-excluded source rows.
    allowed = data[4:, :16]
    for row in batch:
        assert any(np.allclose(row, candidate) for candidate in allowed)


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        PrecalculatedDatasetIterator("nonexistent", directory=str(tmp_path))
