"""HBM-resident training data: device plan, index serving, cache hygiene.

The trainer's fast path (trainer.py `_device_plan_for`) uploads feature pools
to device once and streams only row indices per step — the per-step host
batch transfer through the remote tunnel was the measured trainer bottleneck
(PERF.md). These tests pin the plan's semantics on the CPU mesh.
"""

import gc
import os
import tempfile

import numpy as np
import pytest

from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator
from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator
from heybuddy_tpu.training.trainer import WakeWordTrainer


def _iterator(seed: int = 0) -> WakeWordTrainingDatasetIterator:
    rng = np.random.default_rng(seed)

    def fake(n, s):
        return PrecalculatedDatasetIterator(
            "dev-data", data=rng.normal(0, 1, (n, 16, 96)).astype(np.float32), seed=s
        )

    return WakeWordTrainingDatasetIterator(
        num_batch_threads=1,
        positive=[(fake(40, 1), 8)],
        negative=[(fake(40, 2), 8), (fake(64, 3), 16)],
    )


def test_device_plan_counts_labels_and_index_ranges():
    training = _iterator()
    plan = training.device_plan(max_bytes=1 << 30)
    assert plan is not None
    assert plan.labels == (1.0, 0.0, 0.0)
    assert plan.counts() == (8, 8, 16)
    idxs = plan.sample()
    assert [len(i) for i in idxs] == [8, 8, 16]
    for idx, pool in zip(idxs, plan.pools):
        assert idx.dtype == np.int32
        assert idx.min() >= 0 and idx.max() < len(pool)


def test_take_indices_wraparound_covers_every_row():
    ds = PrecalculatedDatasetIterator(
        "cover", data=np.arange(10 * 16 * 96, dtype=np.float32).reshape(10, 16, 96),
        seed=0,
    )
    seen = np.concatenate([ds.take_indices(7, 10) for _ in range(10)])
    # 70 draws over 10 rows: every row appears exactly 7 times (epoch passes)
    counts = np.bincount(seen, minlength=10)
    assert counts.min() == counts.max() == 7


def test_resident_features_strips_label_row():
    data = np.random.default_rng(0).normal(0, 1, (6, 17, 96)).astype(np.float32)
    ds = PrecalculatedDatasetIterator("labeled", data=data, labeled=True, seed=0)
    rows = ds.resident_features()
    assert rows.shape == (6, 16, 96)
    np.testing.assert_array_equal(rows, data[:, :-1])
    assert ds.resident_nbytes() == rows.nbytes


def test_device_plan_respects_budget():
    training = _iterator()
    assert training.device_plan(max_bytes=16) is None


def test_resident_and_streaming_paths_both_converge(tmp_path, monkeypatch):
    histories = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("HEYBUDDY_DEVICE_DATA", mode)
        training = _iterator()
        trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path / mode), seed=0)
        hist = trainer.train_epoch(
            training,
            num_steps=60,
            validation_steps=10 ** 6,
            checkpoint_steps=10 ** 6,
            logging_steps=10 ** 6,
            name=f"mode{mode}",
        )
        training.stop()
        histories[mode] = hist
        assert len(hist["loss"]) == 60
    # positives are random noise vs random noise: both paths must still
    # drive the masked-mining loss down on their training composition
    assert histories["1"]["loss"][-1] < histories["1"]["loss"][0]
    assert histories["0"]["loss"][-1] < histories["0"]["loss"][0]


def test_device_pool_cache_evicts_on_gc(tmp_path):
    if os.environ.get("HEYBUDDY_DEVICE_DATA") == "0":
        pytest.skip("device data disabled in env")
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), seed=0)
    training = _iterator()
    assert trainer._device_plan_for(training) is not None
    assert trainer._device_pools and trainer._device_plans
    del training
    gc.collect()
    assert not trainer._device_plans  # weakref callbacks evicted entries
    assert not trainer._device_pools


def test_resident_eval_counts_match_direct_forward(tmp_path):
    """HBM-resident eval must produce exactly the counts a direct forward over
    each full source pool gives (one exact pass, no wraparound resampling)."""
    import jax.numpy as jnp

    eval_ds = _iterator(seed=7)
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), seed=0)
    eval_fn = trainer._build_eval(activation_threshold=0.5)
    params = trainer.model.params

    totals = trainer._run_eval(eval_fn, params, eval_ds)

    plan = eval_ds.device_plan(max_bytes=1 << 30)
    assert plan is not None  # resident path must have engaged
    expect = {
        "fp": 0.0, "tp": 0.0, "fn": 0.0, "tn": 0.0, "n_neg": 0.0,
        # clip-only sources: no gate-aware stream counting engages
        "gated_fp": 0.0, "stream_hours": 0.0,
    }
    for (_, label), pool in zip(plan.sources, plan.pools):
        preds = np.asarray(trainer.model.apply(params, jnp.asarray(pool), train=False))[:, 0]
        if label == 1.0:
            expect["tp"] += float((preds > 0.5).sum())
            expect["fn"] += float((preds <= 0.5).sum())
        else:
            expect["fp"] += float((preds >= 0.5).sum())
            expect["tn"] += float((preds < 0.5).sum())
            expect["n_neg"] += float(len(preds))
    assert totals == expect
    # label vectors are cached by (rows, label); a second eval reuses them
    totals2 = trainer._run_eval(eval_fn, params, eval_ds)
    assert totals2 == totals
