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


def test_wire_format_decodes_with_protoc(tmp_path):
    """Independent wire-format validation: protoc (Google's protobuf
    implementation) must decode the exported model against the public ONNX
    schema — catching varint/length-delimited bugs the in-repo OnnxRunner
    round-trip (same author as the writer) cannot."""
    import os
    import shutil
    import subprocess

    protoc = shutil.which("protoc")
    if protoc is None:
        pytest.skip("protoc not installed")

    model = WakeWordMLPModel(num_layers=1, layer_dim=32)
    path = str(tmp_path / "model.onnx")
    model.save_onnx(path)

    schema_dir = os.path.join(os.path.dirname(__file__), "assets")
    with open(path, "rb") as f:
        proc = subprocess.run(
            [protoc, f"-I{schema_dir}", "--decode=onnx.ModelProto", "onnx_subset.proto"],
            stdin=f, capture_output=True, text=True, timeout=60,
        )
    assert proc.returncode == 0, proc.stderr
    decoded = proc.stdout
    # structural assertions on the independently-decoded text
    assert 'op_type: "MatMul"' in decoded or 'op_type: "Gemm"' in decoded
    assert 'name: "input"' in decoded and 'name: "output"' in decoded
    assert "opset_import" in decoded and "version: 19" in decoded
    assert "ir_version" in decoded
    # every graph input/output declares a tensor type with dims
    assert "tensor_type" in decoded and "dim_value" in decoded
    # no unknown-field spillage: protoc prints unknown fields as raw numbers
    # like "15: ..." — the exporter must only emit schema fields
    import re as _re

    assert not _re.search(r"^\s*\d+[:{]", decoded, _re.M), "unknown fields in wire format"


def test_onnx_runner_batched_matches_per_row(tmp_path):
    """The numpy-runner path evaluates a full (n,16,96) batch in one graph
    walk (the exported graph declares batch-1 but its ops are batch-agnostic);
    it must agree with the per-row loop it replaced."""
    from heybuddy_tpu.runtime.onnx_model import WakeWordONNXModel

    model = WakeWordMLPModel()
    path = str(tmp_path / "ww_batch.onnx")
    model.save_onnx(path)
    onnx_model = WakeWordONNXModel(path)
    x = np.random.default_rng(7).normal(size=(5, 16, 96)).astype(np.float32)
    batched = np.asarray(onnx_model(x))
    per_row = np.stack([np.asarray(onnx_model(row[None]))[0] for row in x])
    np.testing.assert_allclose(batched, per_row, atol=1e-6)
    assert batched.shape == (5, 1)


def test_onnx_runner_batch_mixing_falls_back_to_row_loop(tmp_path):
    """ADVICE r4 low: a graph op that mixes across the batch while preserving
    the leading dim must be caught by the first-call cross-check (one batched
    row vs the single-row path) and routed to the per-row loop — a shape-only
    check would silently corrupt multi-hour stream re-scoring."""
    from heybuddy_tpu.runtime.onnx_model import WakeWordONNXModel

    model = WakeWordMLPModel()
    path = str(tmp_path / "ww_mix.onnx")
    model.save_onnx(path)
    onnx_model = WakeWordONNXModel(path)
    if onnx_model._runner is None:
        pytest.skip("onnxruntime session path: no batched numpy fast path")

    true_runner = onnx_model._runner

    class MixingRunner:
        """Corrupts multi-row outputs (batch-mean broadcast) but answers
        single-row calls exactly — the failure mode the shape check misses."""

        def __call__(self, **kw):
            out = dict(true_runner(**kw))
            y = np.asarray(out["output"])
            if y.shape[0] > 1:
                out["output"] = np.broadcast_to(
                    y.mean(axis=0, keepdims=True), y.shape
                ).copy()
            return out

    onnx_model._runner = MixingRunner()
    x = np.random.default_rng(3).normal(size=(6, 16, 96)).astype(np.float32)
    got = np.asarray(onnx_model(x))
    expected = np.stack([np.asarray(true_runner(input=row[None])["output"])[0] for row in x])
    np.testing.assert_allclose(got, expected, atol=1e-6)
    assert onnx_model._batch_ok is False  # verdict cached: no re-probe per call

    # Healthy runner: the fast path is kept after one successful cross-check.
    healthy = WakeWordONNXModel(path)
    _ = np.asarray(healthy(x))
    assert healthy._batch_ok is True
