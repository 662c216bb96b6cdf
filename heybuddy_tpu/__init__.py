"""
heybuddy-tpu: a TPU-native wake-word training and deployment framework.

JAX/XLA/Pallas re-design of the capabilities of hey-buddy
(https://github.com/therealadityashankar/hey-buddy): TTS sample synthesis,
on-device augmentation, fused featurization, three-stage classifier training
with dynamic false-positive control, and ONNX export for the browser runtime.

Public API (lazily imported; heavy deps load on first use)::

    from heybuddy_tpu import (
        SpeechEmbeddings, WakeWordMLPModel, WakeWordTransformerModel,
        WakeWordTrainer, WakeWordTrainingDatasetIterator,
        TrainingFeaturesGenerator, AugmentConfig,
    )
"""

__version__ = "0.1.0"

_EXPORTS = {
    "SpeechEmbeddings": "heybuddy_tpu.models.featurizer",
    "get_speech_embeddings": "heybuddy_tpu.models.featurizer",
    "WakeWordMLPModel": "heybuddy_tpu.models.wakeword",
    "WakeWordTransformerModel": "heybuddy_tpu.models.wakeword",
    "load_model": "heybuddy_tpu.models.wakeword",
    "WakeWordTrainer": "heybuddy_tpu.training.trainer",
    "WakeWordTrainingDatasetIterator": "heybuddy_tpu.data.training",
    "TrainingFeaturesGenerator": "heybuddy_tpu.data.features",
    "PrecalculatedDatasetIterator": "heybuddy_tpu.data.precalculated",
    "AugmentConfig": "heybuddy_tpu.ops.augment",
    "augment_batch": "heybuddy_tpu.ops.augment",
    "mel_spectrogram": "heybuddy_tpu.ops.melspec",
    "get_tts_model": "heybuddy_tpu.models.tts",
    "get_vad_model": "heybuddy_tpu.models.vad",
    "EmbeddingPretrainer": "heybuddy_tpu.training.embedding_pretrain",
}

__all__ = ["__version__"] + sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        value = getattr(module, name)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'heybuddy_tpu' has no attribute {name!r}")
