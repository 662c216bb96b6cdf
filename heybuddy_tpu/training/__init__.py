from heybuddy_tpu.training.trainer import WakeWordTrainer, get_learning_rate

__all__ = ["WakeWordTrainer", "get_learning_rate"]
