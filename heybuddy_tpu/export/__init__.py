from heybuddy_tpu.export.onnx_export import export_mlp_model, build_mlp_graph
from heybuddy_tpu.export.onnx_numpy import OnnxRunner, run_model
from heybuddy_tpu.export.onnx_proto import OnnxModel, parse_model, serialize_model

__all__ = [
    "export_mlp_model",
    "build_mlp_graph",
    "OnnxRunner",
    "run_model",
    "OnnxModel",
    "parse_model",
    "serialize_model",
]
