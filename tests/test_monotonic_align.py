"""Monotonic alignment: native C++ vs numpy reference, path validity."""

import numpy as np
import pytest

from heybuddy_tpu.ops import monotonic_align as ma


def _random_problem(rng, t_x, t_y, batch=1, max_tx=None, max_ty=None):
    max_tx = max_tx or t_x
    max_ty = max_ty or t_y
    value = rng.normal(size=(batch, max_tx, max_ty)).astype(np.float32)
    mask = np.zeros((batch, max_tx, max_ty), dtype=np.float32)
    mask[:, :t_x, :t_y] = 1.0
    return value, mask


def _assert_valid_path(path, t_x, t_y):
    sub = path[:t_x, :t_y]
    # each mel frame assigned to exactly one text token
    np.testing.assert_array_equal(sub.sum(axis=0), np.ones(t_y))
    # monotonic non-decreasing token index
    tokens = sub.argmax(axis=0)
    assert (np.diff(tokens) >= 0).all()
    # starts at first token, ends at last
    assert tokens[0] == 0 and tokens[-1] == t_x - 1


def test_path_validity_various_sizes():
    rng = np.random.default_rng(0)
    for t_x, t_y in [(1, 1), (3, 3), (4, 10), (7, 25), (16, 100)]:
        value, mask = _random_problem(rng, t_x, t_y)
        path = ma.maximum_path(value, mask)
        _assert_valid_path(path[0], t_x, t_y)


def test_native_matches_numpy():
    if ma._load_library() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    for t_x, t_y in [(4, 12), (9, 30)]:
        value, mask = _random_problem(rng, t_x, t_y)
        native = ma.maximum_path(value, mask)
        expected = np.zeros_like(native)
        expected[0, :t_x, :t_y] = ma._maximum_path_numpy(
            (value * mask)[0, :t_x, :t_y], t_x, t_y
        )
        np.testing.assert_array_equal(native, expected)


def test_batched_with_padding():
    rng = np.random.default_rng(2)
    batch = 3
    max_tx, max_ty = 10, 40
    value = rng.normal(size=(batch, max_tx, max_ty)).astype(np.float32)
    mask = np.zeros_like(value)
    sizes = [(4, 20), (10, 40), (2, 7)]
    for b, (tx, ty) in enumerate(sizes):
        mask[b, :tx, :ty] = 1.0
    paths = ma.maximum_path(value, mask)
    for b, (tx, ty) in enumerate(sizes):
        _assert_valid_path(paths[b], tx, ty)
        assert paths[b, tx:, :].sum() == 0 and paths[b, :, ty:].sum() == 0


def test_prefers_high_likelihood_diagonal():
    # A strong diagonal band must be followed by the path.
    t = 8
    value = np.full((1, t, t), -5.0, dtype=np.float32)
    for i in range(t):
        value[0, i, i] = 5.0
    mask = np.ones_like(value)
    path = ma.maximum_path(value, mask)
    np.testing.assert_array_equal(path[0], np.eye(t, dtype=np.int32))
