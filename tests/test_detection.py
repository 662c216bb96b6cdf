"""Tests for the streaming detection gate (runtime/detection.py)."""

import pytest

from heybuddy_tpu.runtime.detection import ConsecutiveGate, count_detections


def test_single_window_fires_by_default():
    gate = ConsecutiveGate(threshold=0.5)
    assert gate.update(0.9) is True


def test_below_threshold_never_fires():
    gate = ConsecutiveGate(threshold=0.5, consecutive=1)
    assert not any(gate.update(s) for s in [0.1, 0.49, 0.0, 0.3])


def test_consecutive_two_requires_two_in_a_row():
    gate = ConsecutiveGate(threshold=0.5, consecutive=2, debounce_windows=0)
    assert gate.update(0.9) is False
    assert gate.update(0.9) is True


def test_consecutive_run_resets_on_dip():
    gate = ConsecutiveGate(threshold=0.5, consecutive=2, debounce_windows=0)
    assert gate.update(0.9) is False
    assert gate.update(0.1) is False  # run resets
    assert gate.update(0.9) is False
    assert gate.update(0.9) is True


def test_debounce_suppresses_retrigger():
    gate = ConsecutiveGate(threshold=0.5, consecutive=1, debounce_windows=3)
    fires = [gate.update(0.9) for _ in range(5)]
    # fire, then 3 refractory windows, then fire again
    assert fires == [True, False, False, False, True]


def test_debounce_zero_fires_every_window():
    gate = ConsecutiveGate(threshold=0.5, consecutive=1, debounce_windows=0)
    assert [gate.update(0.9) for _ in range(3)] == [True, True, True]


def test_reset_clears_run_and_cooldown():
    gate = ConsecutiveGate(threshold=0.5, consecutive=2, debounce_windows=10)
    gate.update(0.9)
    gate.update(0.9)  # fires, enters cooldown
    gate.reset()
    assert gate.update(0.9) is False
    assert gate.update(0.9) is True


def test_invalid_consecutive_raises():
    with pytest.raises(ValueError):
        ConsecutiveGate(consecutive=0)


def test_count_detections_matches_manual_gate():
    scores = [0.9, 0.9, 0.1, 0.9, 0.9, 0.9, 0.1]
    # consecutive=1, debounce 16: only the first spike fires within 7 windows
    assert count_detections(scores, 0.5) == 1
    # consecutive=2, no debounce: fires at idx 1 (run resets on fire) and idx 4
    assert count_detections(scores, 0.5, consecutive=2, debounce_windows=0) == 2


def test_count_detections_single_spikes_suppressed():
    # Alternating spikes: a consecutive=2 gate never fires
    scores = [0.9, 0.1] * 20
    assert count_detections(scores, 0.5, consecutive=2, debounce_windows=0) == 0
    assert count_detections(scores, 0.5, consecutive=1, debounce_windows=0) == 20
