"""
ONNX export of the wake-word MLP classifier.

Deployment-contract parity with reference ``wakeword.py:316-332``: input
"input" float[1,16,96] -> output "output" float[1,1], consumable by the
hey-buddy browser runtime (onnxruntime-web wasm). The graph uses only
maximally-portable primitive ops (MatMul/Add/Sub/Mul/Div/Sqrt/ReduceMean/
Sigmoid/Flatten/Gather), so it loads on every ORT execution provider —
LayerNorm and SiLU are emitted decomposed.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from heybuddy_tpu.export.onnx_proto import (
    ATTR_INT,
    ATTR_INTS,
    FLOAT,
    OnnxAttribute,
    OnnxGraph,
    OnnxModel,
    OnnxNode,
    OnnxTensor,
    OnnxValueInfo,
    serialize_model,
)

__all__ = ["export_mlp_model", "build_mlp_graph"]


class _GraphBuilder:
    def __init__(self) -> None:
        self.nodes: List[OnnxNode] = []
        self.initializers: List[OnnxTensor] = []
        self._counter = 0

    def fresh(self, hint: str) -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def constant(self, hint: str, array: np.ndarray) -> str:
        name = self.fresh(hint)
        self.initializers.append(OnnxTensor(name, np.ascontiguousarray(array)))
        return name

    def op(self, op_type: str, inputs: List[str], hint: str, attributes=None) -> str:
        out = self.fresh(hint)
        self.nodes.append(
            OnnxNode(op_type, inputs, [out], name=out, attributes=attributes or [])
        )
        return out

    def layernorm(self, x: str, gamma: np.ndarray, beta: np.ndarray, eps: float = 1e-5) -> str:
        axes = self.constant("ln_axes", np.asarray([-1], dtype=np.int64))
        mean = self.op("ReduceMean", [x, axes], "ln_mean")
        centered = self.op("Sub", [x, mean], "ln_center")
        sq = self.op("Mul", [centered, centered], "ln_sq")
        var = self.op("ReduceMean", [sq, axes], "ln_var")
        eps_c = self.constant("ln_eps", np.asarray(eps, dtype=np.float32))
        var_eps = self.op("Add", [var, eps_c], "ln_vareps")
        std = self.op("Sqrt", [var_eps], "ln_std")
        normed = self.op("Div", [centered, std], "ln_norm")
        scaled = self.op("Mul", [normed, self.constant("ln_g", gamma)], "ln_scale")
        return self.op("Add", [scaled, self.constant("ln_b", beta)], "ln_out")

    def linear(self, x: str, weight: np.ndarray, bias: np.ndarray, hint: str) -> str:
        mm = self.op("MatMul", [x, self.constant(f"{hint}_w", weight)], f"{hint}_mm")
        return self.op("Add", [mm, self.constant(f"{hint}_b", bias)], f"{hint}_out")

    def silu(self, x: str) -> str:
        sig = self.op("Sigmoid", [x], "silu_sig")
        return self.op("Mul", [x, sig], "silu_out")

    def mlp(self, x: str, params: Dict[str, Any], hint: str) -> str:
        hidden = self.linear(
            x, np.asarray(params["hidden"]["w"]), np.asarray(params["hidden"]["b"]), f"{hint}_hidden"
        )
        act = self.silu(hidden)
        if "gate" in params:
            gate = self.linear(
                x, np.asarray(params["gate"]["w"]), np.asarray(params["gate"]["b"]), f"{hint}_gate"
            )
            act = self.op("Mul", [act, gate], f"{hint}_gated")
        return self.linear(
            act, np.asarray(params["output"]["w"]), np.asarray(params["output"]["b"]), f"{hint}_proj"
        )


def build_mlp_graph(model: Any) -> OnnxGraph:
    """Build the ONNX graph for a WakeWordMLPModel."""
    params = model.params
    builder = _GraphBuilder()

    flat = builder.op(
        "Flatten", ["input"], "flatten", [OnnxAttribute("axis", 1, ATTR_INT)]
    )
    normed = builder.layernorm(
        flat, np.asarray(params["norm_in"]["g"]), np.asarray(params["norm_in"]["b"])
    )
    states = builder.mlp(normed, params["mlp_in"], "mlp_in")

    for i, (indices, half) in enumerate(zip(model.half_indices, params["half_layers"])):
        idx = builder.constant(f"half{i}_idx", np.asarray(indices, dtype=np.int64))
        gathered = builder.op(
            "Gather", ["input", idx], f"half{i}_gather", [OnnxAttribute("axis", 1, ATTR_INT)]
        )
        half_flat = builder.op(
            "Flatten", [gathered], f"half{i}_flat", [OnnxAttribute("axis", 1, ATTR_INT)]
        )
        half_norm = builder.layernorm(
            half_flat, np.asarray(half["norm"]["g"]), np.asarray(half["norm"]["b"])
        )
        half_out = builder.mlp(half_norm, half["mlp"], f"half{i}")
        states = builder.op("Add", [states, half_out], f"half{i}_residual")

    for i, layer in enumerate(params["layers"]):
        normed = builder.layernorm(
            states, np.asarray(layer["norm"]["g"]), np.asarray(layer["norm"]["b"])
        )
        states = builder.mlp(normed, layer["mlp"], f"layer{i}")

    normed = builder.layernorm(
        states, np.asarray(params["norm_out"]["g"]), np.asarray(params["norm_out"]["b"])
    )
    logits = builder.mlp(normed, params["mlp_out"], "mlp_out")
    builder.nodes.append(OnnxNode("Sigmoid", [logits], ["output"], name="output_sigmoid"))

    frames, dim = model.input_shape
    return OnnxGraph(
        name="heybuddy_wakeword",
        nodes=builder.nodes,
        initializers=builder.initializers,
        inputs=[OnnxValueInfo("input", (1, frames, dim), FLOAT)],
        outputs=[OnnxValueInfo("output", (1, 1), FLOAT)],
    )


def export_mlp_model(model: Any, path: str, opset_version: int = 19) -> None:
    """Write the classifier as ``.onnx`` (reference save_onnx contract)."""
    graph = build_mlp_graph(model)
    serialize_model(OnnxModel(graph, opset_version=opset_version), path)
