#!/usr/bin/env python
"""
End-to-end wake-word training walkthrough (the reference's
WakeWordTrainer.ipynb equivalent, as a script).

Runs fully offline at toy scale; scale the sample counts / steps up for a real
model, or just use the CLI: `heybuddy train "hey computer"`.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PHRASE = "hey computer"

# 1. Build training / validation / testing iterators. Feature generation
#    (TTS -> augment -> featurize) happens lazily and is cached on disk.
from heybuddy_tpu import WakeWordTrainingDatasetIterator, WakeWordTrainer

training = WakeWordTrainingDatasetIterator.default(
    PHRASE,
    positive_samples=256,
    adversarial_samples=256,
    adversarial_phrases=16,
    positive_batch_size=32,
    adversarial_batch_size=32,
    negative_batch_size=0,       # hosted negative set optional/offline
    num_batch_threads=2,
)
validation = WakeWordTrainingDatasetIterator.validation(
    PHRASE, validation_samples=64, positive_batch_size=32, negative_batch_size=0
)

# 2. Train three stages with dynamic false-positive control.
trainer = WakeWordTrainer(checkpoint_dir="./checkpoints")
trainer(
    training,
    validation=validation,
    num_steps=300,
    num_stages=2,
    validation_steps=100,
    checkpoint_steps=10_000,
    name=PHRASE.replace(" ", "-"),
)

# 3. Export for the browser runtime.
final = f"./checkpoints/{PHRASE.replace(' ', '-')}_final.npz"
from heybuddy_tpu import load_model

model = load_model(final)
model.save_onnx(final.replace(".npz", ".onnx"))
print("exported", final.replace(".npz", ".onnx"))

# 4. Detect in a file.
times = model.predict_timecodes("path/to/audio.wav") if os.path.exists("path/to/audio.wav") else []
print("detections:", times)
