"""Unit tests for the quality harness's candidate-selection ranking.

The selector (scripts/quality_eval.py:selection_key) encodes two round-4
lessons from the v20/v21 campaigns (QUALITY.md "Round 4"): short selection
streams cannot resolve gated fp/hour near the 1.5/hr target, so the penalty
prices the Poisson upper bound of the rate, and a candidate over the 0.05
FAR target (the best-resolved selection metric) can never be rescued by a
lucky zero-detection stream draw. Reference target values:
/root/reference/src/python/heybuddy/constants.py:85 (fp/hr) and the
trainer's validation metrics (trainer.py:511-536).
"""

import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def qe():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "quality_eval.py")
    spec = importlib.util.spec_from_file_location("quality_eval", path)
    mod = importlib.util.module_from_spec(spec)
    assert spec.loader is not None
    spec.loader.exec_module(mod)
    return mod


def test_zero_detections_carries_rule_of_three_upper(qe):
    # 0 detections over 2 h must not score as rate 0: the 97.5% upper bound
    # is 3/hours = 1.5/hr, exactly at the target, so penalty stays 0 but the
    # recorded upper is honest.
    key, fp2, fp2_upper, pen = qe.selection_key(0, 2.0, 0.02, 0.02)
    assert fp2 == 0.0
    assert fp2_upper == pytest.approx(1.5)
    assert pen == pytest.approx(0.0)
    # Over 1 h the same zero count can no longer exclude 3/hr.
    _, _, upper_1h, pen_1h = qe.selection_key(0, 1.0, 0.02, 0.02)
    assert upper_1h == pytest.approx(3.0)
    assert pen_1h == pytest.approx(1.5)


def test_far_gate_is_lexicographic(qe):
    # The v21 regression: the consolidated candidate drew 0 selection
    # detections but sat at FAR 0.0775; a FAR-passing candidate with a
    # mediocre stream draw must outrank it.
    lucky_far_fail = qe.selection_key(0, 2.0, 0.0775, 0.015)[0]
    honest_far_pass = qe.selection_key(8, 2.0, 0.045, 0.04)[0]
    assert honest_far_pass < lucky_far_fail
    # Among FAR-passing candidates, fewer detections still win.
    fewer = qe.selection_key(2, 2.0, 0.045, 0.04)[0]
    assert fewer < honest_far_pass


def test_upper_bound_monotone_in_detections(qe):
    uppers = [qe.selection_key(k, 2.0, 0.0, 0.0)[2] for k in range(6)]
    assert uppers == sorted(uppers)
    assert all(b > a for a, b in zip(uppers, uppers[1:]))


def test_ties_break_on_far_then_rate(qe):
    # Equal gate + equal penalty (both fully inside targets): lower FAR wins.
    a = qe.selection_key(0, 2.0, 0.01, 0.01)[0]
    b = qe.selection_key(0, 2.0, 0.03, 0.01)[0]
    assert a < b


def test_far_attribution_contract(qe):
    # Per-text FAR attribution: rates per text, ranked, concentration stats.
    # A constant-score model makes the expected rates exact.
    class Fire:
        def __call__(self, feats):
            import numpy as np

            return np.ones((feats.shape[0], 1), dtype=np.float32)

    out = qe.far_attribution(
        Fire(), ["hey bunny", "say study"], seed=0, thr=0.5, per_text=2
    )
    assert out["texts"] == 2 and out["texts_firing"] == 2
    assert set(out["rates"]) == {"hey bunny", "say study"}
    assert all(r == 1.0 for r in out["rates"].values())
    assert out["profile"] in ("SPECIFIC", "DIFFUSE")

    class Silent:
        def __call__(self, feats):
            import numpy as np

            return np.zeros((feats.shape[0], 1), dtype=np.float32)

    quiet = qe.far_attribution(
        Silent(), ["hey bunny"], seed=0, thr=0.5, per_text=2
    )
    assert quiet["texts_firing"] == 0 and quiet["top5_share"] is None


def test_recall_gate_is_lexicographic_first(qe):
    # The v23 regression (QUALITY.md round-4 tail): a candidate that drops a
    # selection rendering of the phrase must lose to one that fires on all of
    # them, even with better FAR and a luckier stream draw.
    misses_one = qe.selection_key(0, 2.0, 0.01, 0.01, sel_recall=11 / 12)[0]
    full_recall = qe.selection_key(6, 2.0, 0.049, 0.04, sel_recall=1.0)[0]
    assert full_recall < misses_one
    # The recall gate outranks even the FAR gate: a full-recall candidate
    # over the FAR target still beats a recall-dropping FAR-clean one.
    full_recall_far_fail = qe.selection_key(0, 2.0, 0.08, 0.01, sel_recall=1.0)[0]
    assert full_recall_far_fail < misses_one
    # Default (no recall measurement) behaves as full recall.
    assert qe.selection_key(0, 2.0, 0.01, 0.01)[0] == qe.selection_key(
        0, 2.0, 0.01, 0.01, sel_recall=1.0
    )[0]


def test_operating_point_warnings_flags_v24b_degeneracy(qe):
    # The exact v24b block: threshold pushed to 1.0 (grid ceiling) with
    # operating_frr 1.0 — both degeneracies must be flagged.
    w = qe.operating_point_warnings(1.0, 1.0, 1.0)
    assert len(w) == 2
    assert any("ceiling" in m for m in w)
    assert any("positive score mass" in m for m in w)


def test_operating_point_warnings_flags_unresolvable_hours(qe):
    # 0.5 h of stream cannot resolve 1.5/hr (needs >= 0.67 h for one
    # expected event) — the same guard the gate-aware validation counter got.
    w = qe.operating_point_warnings(0.68, 0.02, 0.5)
    assert len(w) == 1
    assert "cannot resolve" in w[0]


def test_operating_point_warnings_empty_for_healthy_block(qe):
    assert qe.operating_point_warnings(0.68, 0.015, 6.0) == []
