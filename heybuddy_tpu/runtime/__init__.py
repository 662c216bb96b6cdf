from heybuddy_tpu.runtime.model_thread import WakeWordModelThread
from heybuddy_tpu.runtime.onnx_model import WakeWordONNXModel

__all__ = ["WakeWordModelThread", "WakeWordONNXModel"]
