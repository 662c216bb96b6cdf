"""Trainer: LR schedule goldens, convergence, checkpointing, resume."""

import numpy as np
import pytest

from heybuddy_tpu.training.trainer import (
    WakeWordTrainer,
    adjust_negative_weight,
    get_learning_rate,
)


def test_learning_rate_schedule_matches_reference_formula():
    """Golden values from the reference formula (trainer.py:127-156)."""
    total, warmup, hold, target = 1000, 200, 333, 1e-3
    # warmup: linear ramp
    assert get_learning_rate(0, warmup, hold, total, target) == 0.0
    assert abs(get_learning_rate(100, warmup, hold, total, target) - 5e-4) < 1e-9
    # hold: constant at target
    assert abs(get_learning_rate(300, warmup, hold, total, target) - target) < 1e-9
    assert abs(get_learning_rate(533, warmup, hold, total, target) - target) < 1e-9
    # cosine decay after warmup+hold
    mid = get_learning_rate(766, warmup, hold, total, target)
    expected = 0.5 * target * (1 + np.cos(np.pi * (766 - warmup - hold) / (total - warmup - hold)))
    assert abs(mid - expected) < 1e-12
    assert get_learning_rate(total, warmup, hold, total, target) < 1e-8


class ToyIterator:
    """Separable synthetic stream: fresh samples each batch (no memorization)."""

    def __init__(self, bs=32, once=False, seed=0):
        self.rng = np.random.default_rng(seed)
        self.bs = bs
        self.once = once

    # Zero-mean pattern signal (a global mean shift would be erased by the
    # model's input LayerNorm): positives follow +pattern, negatives -pattern.
    PATTERN = np.sign(np.sin(np.arange(16 * 96))).reshape(16, 96).astype(np.float32)

    def __iter__(self):
        count = 0
        while True:
            noise = self.rng.normal(0.0, 1.0, (2 * self.bs, 16, 96)).astype(np.float32)
            pos = noise[: self.bs] + self.PATTERN
            neg = noise[self.bs :] - self.PATTERN
            x = np.concatenate([pos, neg])
            y = np.concatenate([np.ones(self.bs), np.zeros(self.bs)]).astype(np.float32)
            yield x, y
            count += 1
            if self.once and count >= 2:
                return


def test_train_epoch_converges_and_validates(tmp_path):
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1)
    history = trainer.train_epoch(
        ToyIterator(),
        validation=ToyIterator(once=True, seed=1),
        num_steps=100,
        validation_steps=80,
        checkpoint_steps=1000,
        learning_rate=2e-3,
    )
    assert history["loss"][-1] < history["loss"][0]
    assert history["loss"][-1] < 0.2
    assert history["recall"][-1] > 0.9
    assert history["validation_recall"][-1] > 0.8
    assert len(history["loss"]) == 100


def test_checkpoint_save_resume(tmp_path):
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1)
    trainer.train_epoch(ToyIterator(), num_steps=10, validation_steps=100, checkpoint_steps=1000)
    trainer.start_stage = 1
    trainer.resumed_negative_weight = 4.0
    trainer.save_checkpoint("toy")

    resumed = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1)
    resumed.resume("toy")
    assert resumed.start_stage == 1
    assert resumed.resumed_negative_weight == 4.0
    x = np.random.default_rng(0).normal(size=(4, 16, 96)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(trainer.model(x)), np.asarray(resumed.model(x)), atol=1e-6
    )


def test_resume_missing_raises(tmp_path):
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1)
    with pytest.raises(FileNotFoundError):
        trainer.resume("nonexistent")


def test_negative_weight_hold_band():
    """Raise above target, hold in [target/2, target], lower below target/2.

    The hold at exactly-target matters: validation fp/hr is quantized to
    multiples of 1/negative-hours, so one residual fire lands on the target
    and must not read as headroom (reports/quality-v16.json regression)."""
    assert adjust_negative_weight(4.0, 3.0, 1.5, 2.0) == 8.0  # above target
    assert adjust_negative_weight(4.0, 1.5, 1.5, 2.0) == 4.0  # at target: hold
    assert adjust_negative_weight(4.0, 1.0, 1.5, 2.0) == 4.0  # in band: hold
    assert adjust_negative_weight(4.0, 0.5, 1.5, 2.0) == 2.0  # real headroom
    assert adjust_negative_weight(1.0, 0.0, 1.5, 2.0) == 1.0  # floor


def test_dynamic_negative_weight_adjusts(tmp_path):
    """FP/hr above target doubles the negative weight (trainer.py:531-536)."""

    class AllNegativeValidation:
        def __iter__(self):
            # model outputs ~0.5 at init -> everything counts as a false positive
            x = np.random.default_rng(2).normal(size=(64, 16, 96)).astype(np.float32)
            y = np.zeros(64, dtype=np.float32)
            yield x, y

    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=0)
    history = trainer.train_epoch(
        ToyIterator(bs=8),
        validation=AllNegativeValidation(),
        num_steps=30,
        validation_steps=10,
        checkpoint_steps=1000,
        negative_weight_schedule=1.0,
        negative_weight_adjust_ratio=2.0,
        target_false_positive_rate=1.5,
        learning_rate=0.0,  # keep the model near init so FPs persist
    )
    assert history["negative_weight"].max() >= 2.0


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1,
                              checkpoint_backend="orbax")
    trainer.train_epoch(ToyIterator(), num_steps=6, validation_steps=100, checkpoint_steps=1000)
    trainer.save_checkpoint("orbax-test")
    assert (tmp_path / "orbax-test_orbax").exists()

    restored = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1,
                               checkpoint_backend="orbax")
    restored.resume_orbax("orbax-test")
    x = np.random.default_rng(0).normal(size=(2, 16, 96)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(trainer.model(x)), np.asarray(restored.model(x)), atol=1e-6
    )


def test_eval_ignores_mesh_padding_rows(tmp_path):
    """Padded labels (y=-1) must not count as false positives (ADVICE r1)."""
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=0)
    eval_fn = trainer._build_eval(activation_threshold=0.5)
    x = np.random.default_rng(3).normal(size=(8, 16, 96)).astype(np.float32)
    y = np.array([1, 1, 0, 0, -1, -1, -1, -1], dtype=np.float32)
    out = eval_fn(trainer.model.params, x, y)
    # Whatever the model predicts, padded rows contribute to nothing.
    assert float(out["n_neg"]) == 2.0
    assert float(out["fp"]) <= 2.0
    assert float(out["tp"]) + float(out["fn"]) == 2.0


def test_checkpoint_records_current_step_and_resume_fast_forwards(tmp_path):
    """Mid-stage checkpoints record the live step; resume continues there."""
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1)
    trainer.train_epoch(
        ToyIterator(), num_steps=8, validation_steps=100, checkpoint_steps=5, name="step"
    )
    import json, os

    with open(os.path.join(str(tmp_path), "step_5_state.json")) as f:
        assert json.load(f)["step"] == 5

    resumed = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1)
    resumed.resume("step")
    assert resumed.start_step == 5
    history = resumed.train_epoch(
        ToyIterator(), num_steps=8, validation_steps=100, checkpoint_steps=1000
    )
    # Only the remaining 3 steps run, and the resumed counter is consumed.
    assert len(history["loss"]) == 3
    assert resumed.start_step == 0


def test_quantization_warning_for_tiny_validation_sets(tmp_path):
    """A validation set too small to resolve the fp/hr target warns once:
    one FP clip in 64 negatives already measures 1/(64*1.44s) = 39 fp/hr,
    so the controller could only settle at zero FPs (over-weighting
    negatives and raising FRR). Found when the exact HBM-resident eval
    replaced the wraparound-resampled one and exposed the quantization."""
    import logging

    class TinyValidation:
        def __iter__(self):
            x = np.random.default_rng(2).normal(size=(64, 16, 96)).astype(np.float32)
            y = np.zeros(64, dtype=np.float32)
            yield x, y

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture(level=logging.WARNING)
    logging.getLogger("heybuddy").addHandler(handler)  # propagate=False upstream
    try:
        trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=0)
        trainer.train_epoch(
            ToyIterator(bs=8),
            validation=TinyValidation(),
            num_steps=25,
            validation_steps=10,
            checkpoint_steps=1000,
            negative_weight_schedule=1.0,
            negative_weight_adjust_ratio=2.0,
            target_false_positive_rate=1.5,
            learning_rate=0.0,
        )
    finally:
        logging.getLogger("heybuddy").removeHandler(handler)
    msgs = [m for m in records if "controller" in m]
    assert len(msgs) == 1, msgs
    assert "ZERO validation FPs" in msgs[0]


def test_gate_aware_stream_validation(tmp_path):
    """Validation negatives tagged as ordered stream windows are scored in
    temporal order and gated like the deployed runtime: the controller's
    fp/hr equals ConsecutiveGate fire events over TRUE stream hours
    (n_windows x stride), not per-window FPs over n x 1.44 s 'clip hours'
    (12x overcounted at the 0.12 s runtime stride)."""
    from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator
    from heybuddy_tpu.runtime.detection import count_detections

    rng = np.random.default_rng(0)
    pos_pool = rng.normal(size=(16, 16, 96)).astype(np.float32)
    stream_pool = rng.normal(size=(240, 16, 96)).astype(np.float32)
    pos = PrecalculatedDatasetIterator("pos", data=pos_pool, seed=0)
    stream = PrecalculatedDatasetIterator("stream", data=stream_pool, seed=0)
    stream.stream_stride_seconds = 0.12

    validation = WakeWordTrainingDatasetIterator(
        num_batch_threads=1, positive=[(pos, 4)], negative=[(stream, 8)]
    )
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=0)
    history = trainer.train_epoch(
        ToyIterator(bs=8),
        validation=validation,
        num_steps=5,
        validation_steps=2,
        checkpoint_steps=1000,
        learning_rate=0.0,  # params frozen: eval-time preds == final preds
        validation_gate_consecutive=2,
    )
    preds = np.asarray(trainer.model(stream_pool)).reshape(-1)
    fires = count_detections(preds, 0.5, consecutive=2)
    hours = 240 * 0.12 / 3600.0
    assert history["validation_false_positive_per_hour"][-1] == pytest.approx(
        fires / hours
    )


def test_untagged_stream_validation_keeps_clip_semantics(tmp_path):
    """Without the stream tag, negatives keep the reference's per-clip
    counting (fp over n x 1.44 s hours)."""
    from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator

    rng = np.random.default_rng(0)
    neg_pool = rng.normal(size=(240, 16, 96)).astype(np.float32)
    neg = PrecalculatedDatasetIterator("neg", data=neg_pool, seed=0)
    validation = WakeWordTrainingDatasetIterator(
        num_batch_threads=1, positive=[], negative=[(neg, 8)]
    )
    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=0)
    history = trainer.train_epoch(
        ToyIterator(bs=8),
        validation=validation,
        num_steps=5,
        validation_steps=2,
        checkpoint_steps=1000,
        learning_rate=0.0,
    )
    preds = np.asarray(trainer.model(neg_pool)).reshape(-1)
    fp = int(np.sum(preds >= 0.5))
    hours = 240 * 1.44 / 3600.0
    assert history["validation_false_positive_per_hour"][-1] == pytest.approx(
        fp / hours
    )
