from heybuddy_tpu.data.precalculated import (
    PrecalculatedDatasetIterator,
    HostedPrecalculatedDatasetIterator,
    PrecalculatedTrainingDatasetLarge,
    PrecalculatedTrainingDatasetMedium,
    PrecalculatedValidationDataset,
)
from heybuddy_tpu.data.training import TrainingDatasetIterator, WakeWordTrainingDatasetIterator

__all__ = [
    "PrecalculatedDatasetIterator",
    "HostedPrecalculatedDatasetIterator",
    "PrecalculatedTrainingDatasetLarge",
    "PrecalculatedTrainingDatasetMedium",
    "PrecalculatedValidationDataset",
    "TrainingDatasetIterator",
    "WakeWordTrainingDatasetIterator",
]
