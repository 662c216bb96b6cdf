"""ONNX export: round-trip numeric parity and wire-format self-consistency."""

import numpy as np
import pytest

from heybuddy_tpu.export.onnx_numpy import OnnxRunner
from heybuddy_tpu.export.onnx_proto import (
    FLOAT,
    OnnxGraph,
    OnnxModel,
    OnnxNode,
    OnnxTensor,
    OnnxValueInfo,
    parse_model,
    serialize_model,
)
from heybuddy_tpu.models.wakeword import WakeWordMLPModel


@pytest.mark.parametrize(
    "arch_kwargs",
    [{}, {"use_half_layers": True}, {"use_gating": False}, {"num_layers": 3, "layer_dim": 64}],
)
def test_export_matches_jax_forward(tmp_path, arch_kwargs):
    model = WakeWordMLPModel(**arch_kwargs)
    path = str(tmp_path / "model.onnx")
    model.save_onnx(path)

    runner = OnnxRunner.from_file(path)
    x = np.random.default_rng(0).normal(size=(1, 16, 96)).astype(np.float32)
    onnx_out = runner(input=x)["output"]
    jax_out = np.asarray(model(x))
    assert onnx_out.shape == (1, 1)
    np.testing.assert_allclose(onnx_out, jax_out, atol=1e-5)


def test_export_io_contract(tmp_path):
    """Deployment contract: input[1,16,96] float named 'input', output[1,1] 'output'."""
    model = WakeWordMLPModel()
    path = str(tmp_path / "model.onnx")
    model.save_onnx(path)
    parsed = parse_model(path)
    assert parsed.opset_version == 19
    (inp,) = parsed.graph.inputs
    (outp,) = parsed.graph.outputs
    assert inp.name == "input" and inp.shape == (1, 16, 96) and inp.elem_type == FLOAT
    assert outp.name == "output" and outp.shape == (1, 1)


def test_proto_roundtrip(tmp_path):
    weight = OnnxTensor("w", np.arange(6, dtype=np.float32).reshape(2, 3))
    graph = OnnxGraph(
        name="g",
        nodes=[OnnxNode("MatMul", ["x", "w"], ["output"], name="mm")],
        initializers=[weight],
        inputs=[OnnxValueInfo("x", (1, 2))],
        outputs=[OnnxValueInfo("output", (1, 3))],
    )
    path = str(tmp_path / "tiny.onnx")
    serialize_model(OnnxModel(graph), path)
    parsed = parse_model(path)
    assert parsed.graph.name == "g"
    assert parsed.graph.nodes[0].op_type == "MatMul"
    np.testing.assert_array_equal(parsed.graph.initializers[0].array, weight.array)

    runner = OnnxRunner(parsed)
    x = np.asarray([[1.0, 2.0]], dtype=np.float32)
    np.testing.assert_allclose(runner(x=x)["output"], x @ weight.array)


def test_onnx_runner_model_class(tmp_path):
    from heybuddy_tpu.runtime.onnx_model import WakeWordONNXModel

    model = WakeWordMLPModel()
    path = str(tmp_path / "ww.onnx")
    model.save_onnx(path)
    onnx_model = WakeWordONNXModel(path)
    x = np.random.default_rng(1).normal(size=(3, 16, 96)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(onnx_model(x)), np.asarray(model(x)), atol=1e-5
    )
