"""
ONNX->JAX converter parity vs torch.

These tests construct real ONNX files with the in-repo protobuf writer using
weights taken from torch modules, convert them with OnnxJaxFunction, and
compare against the torch forward — a genuine cross-implementation check of
both the wire format round-trip and every op implementation, without needing
the (unavailable) onnx/onnxruntime packages. This is the machinery that
imports the reference's frozen models (SURVEY.md hard part #1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heybuddy_tpu.export.onnx_proto import (  # noqa: E402
    ATTR_FLOAT,
    ATTR_GRAPH,
    ATTR_INT,
    ATTR_INTS,
    ATTR_STRING,
    ATTR_TENSOR,
    OnnxAttribute,
    OnnxGraph,
    OnnxModel,
    OnnxNode,
    OnnxTensor,
    OnnxValueInfo,
    parse_model,
    serialize_model,
)
from heybuddy_tpu.export.onnx_to_jax import OnnxJaxFunction  # noqa: E402


def attr(name, value):
    if isinstance(value, bool):
        return OnnxAttribute(name, int(value), ATTR_INT)
    if isinstance(value, int):
        return OnnxAttribute(name, value, ATTR_INT)
    if isinstance(value, float):
        return OnnxAttribute(name, value, ATTR_FLOAT)
    if isinstance(value, str):
        return OnnxAttribute(name, value, ATTR_STRING)
    if isinstance(value, (list, tuple)):
        return OnnxAttribute(name, [int(v) for v in value], ATTR_INTS)
    if isinstance(value, OnnxTensor):
        return OnnxAttribute(name, value, ATTR_TENSOR)
    if isinstance(value, OnnxGraph):
        return OnnxAttribute(name, value, ATTR_GRAPH)
    raise TypeError(type(value))


def node(op, inputs, outputs, **attrs):
    return OnnxNode(op, list(inputs), list(outputs),
                    attributes=[attr(k, v) for k, v in attrs.items()])


def build(path, nodes, initializers, inputs, outputs):
    graph = OnnxGraph(
        "test",
        nodes,
        [OnnxTensor(k, np.asarray(v)) for k, v in initializers.items()],
        [OnnxValueInfo(n, s) for n, s in inputs],
        [OnnxValueInfo(n, s) for n, s in outputs],
    )
    serialize_model(OnnxModel(graph), path)
    return OnnxJaxFunction(parse_model(path))


def t2n(t):
    return t.detach().numpy()


def test_conv2d_bn_pool_gemm_parity(tmp_path):
    """Conv (stride/pad/groups) -> BN -> ReLU -> MaxPool -> flatten -> Gemm."""
    torch.manual_seed(0)
    conv1 = torch.nn.Conv2d(2, 8, 3, stride=2, padding=1)
    dw = torch.nn.Conv2d(8, 8, 3, padding=1, groups=8)  # depthwise
    bn = torch.nn.BatchNorm2d(8).eval()
    bn.running_mean.data = torch.randn(8) * 0.1
    bn.running_var.data = torch.rand(8) + 0.5
    fc = torch.nn.Linear(8 * 4 * 4, 5)

    x = torch.randn(3, 2, 16, 16)
    with torch.no_grad():
        ref = fc(
            torch.nn.functional.max_pool2d(
                torch.relu(bn(dw(conv1(x)))), 2
            ).flatten(1)
        )

    fn = build(
        str(tmp_path / "conv.onnx"),
        [
            node("Conv", ["x", "w1", "b1"], ["c1"], strides=[2, 2], pads=[1, 1, 1, 1],
                 kernel_shape=[3, 3]),
            node("Conv", ["c1", "w2", "b2"], ["c2"], pads=[1, 1, 1, 1], group=8,
                 kernel_shape=[3, 3]),
            node("BatchNormalization", ["c2", "g", "be", "m", "v"], ["bn"], epsilon=1e-5),
            node("Relu", ["bn"], ["r"]),
            node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
            node("Flatten", ["p"], ["f"], axis=1),
            node("Gemm", ["f", "wf", "bf"], ["y"], transB=1),
        ],
        {
            "w1": t2n(conv1.weight), "b1": t2n(conv1.bias),
            "w2": t2n(dw.weight), "b2": t2n(dw.bias),
            "g": t2n(bn.weight), "be": t2n(bn.bias),
            "m": bn.running_mean.numpy(), "v": bn.running_var.numpy(),
            "wf": t2n(fc.weight), "bf": t2n(fc.bias),
        },
        [("x", (3, 2, 16, 16))],
        [("y", (3, 5))],
    )
    out = np.asarray(fn(fn.params, x.numpy()))
    np.testing.assert_allclose(out, t2n(ref), atol=2e-5)


def test_conv1d_avgpool_parity(tmp_path):
    torch.manual_seed(1)
    conv = torch.nn.Conv1d(1, 6, 5, stride=3, padding=2)
    x = torch.randn(2, 1, 64)
    with torch.no_grad():
        ref = torch.nn.functional.avg_pool1d(torch.relu(conv(x)), 2)

    fn = build(
        str(tmp_path / "conv1d.onnx"),
        [
            node("Conv", ["x", "w", "b"], ["c"], strides=[3], pads=[2, 2],
                 kernel_shape=[5]),
            node("Relu", ["c"], ["r"]),
            node("AveragePool", ["r"], ["y"], kernel_shape=[2], strides=[2]),
        ],
        {"w": t2n(conv.weight), "b": t2n(conv.bias)},
        [("x", (2, 1, 64))],
        [("y", (2, 6, 11))],
    )
    out = np.asarray(fn(fn.params, x.numpy()))
    np.testing.assert_allclose(out, t2n(ref), atol=1e-5)


def _torch_lstm_to_onnx_weights(lstm, layer):
    """Reorder torch (i,f,g,o) gate blocks into ONNX (i,o,f,c) layout."""
    H = lstm.hidden_size

    def reorder(mat):
        i, f, g, o = np.split(mat, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    w_ih = reorder(t2n(getattr(lstm, f"weight_ih_l{layer}")))
    w_hh = reorder(t2n(getattr(lstm, f"weight_hh_l{layer}")))
    b_ih = reorder(t2n(getattr(lstm, f"bias_ih_l{layer}")).reshape(4 * H, 1)).reshape(-1)
    b_hh = reorder(t2n(getattr(lstm, f"bias_hh_l{layer}")).reshape(4 * H, 1)).reshape(-1)
    return w_ih[None], w_hh[None], np.concatenate([b_ih, b_hh])[None]


def test_lstm_two_layer_stateful_parity(tmp_path):
    """Two stacked ONNX LSTM nodes with explicit h/c — the Silero VAD shape."""
    torch.manual_seed(2)
    H, IN, SEQ, B = 16, 10, 7, 3
    lstm = torch.nn.LSTM(IN, H, num_layers=2)
    x = torch.randn(SEQ, B, IN)
    h0 = torch.randn(2, B, H)
    c0 = torch.randn(2, B, H)
    with torch.no_grad():
        y_ref, (h_ref, c_ref) = lstm(x, (h0, c0))

    w0, r0, b0 = _torch_lstm_to_onnx_weights(lstm, 0)
    w1, r1, b1 = _torch_lstm_to_onnx_weights(lstm, 1)
    fn = build(
        str(tmp_path / "lstm.onnx"),
        [
            # Split the [2,B,H] states into per-layer [1,B,H] slices like real
            # exporters do.
            node("Slice", ["h0", "zero", "one", "ax0"], ["h0a"]),
            node("Slice", ["h0", "one", "two", "ax0"], ["h0b"]),
            node("Slice", ["c0", "zero", "one", "ax0"], ["c0a"]),
            node("Slice", ["c0", "one", "two", "ax0"], ["c0b"]),
            node("LSTM", ["x", "w0", "r0", "b0", "", "h0a", "c0a"], ["ya", "ha", "ca"],
                 hidden_size=H),
            node("Squeeze", ["ya", "ax1"], ["ya2"]),
            node("LSTM", ["ya2", "w1", "r1", "b1", "", "h0b", "c0b"], ["yb", "hb", "cb"],
                 hidden_size=H),
            node("Squeeze", ["yb", "ax1"], ["y"]),
            node("Concat", ["ha", "hb"], ["h"], axis=0),
            node("Concat", ["ca", "cb"], ["c"], axis=0),
        ],
        {
            "w0": w0, "r0": r0, "b0": b0, "w1": w1, "r1": r1, "b1": b1,
            "zero": np.array([0], np.int64), "one": np.array([1], np.int64),
            "two": np.array([2], np.int64), "ax0": np.array([0], np.int64),
            "ax1": np.array([1], np.int64),
        },
        [("x", (SEQ, B, IN)), ("h0", (2, B, H)), ("c0", (2, B, H))],
        [("y", (SEQ, B, H)), ("h", (2, B, H)), ("c", (2, B, H))],
    )
    y, h, c = fn(fn.params, x.numpy(), h0.numpy(), c0.numpy())
    np.testing.assert_allclose(np.asarray(y), t2n(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t2n(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t2n(c_ref), atol=1e-5)


def test_shape_arithmetic_stays_static_under_jit(tmp_path):
    """The Shape->Gather->Concat->Reshape exporter idiom must trace under jit."""
    import jax

    fn = build(
        str(tmp_path / "shape.onnx"),
        [
            node("Shape", ["x"], ["s"]),
            node("Gather", ["s", "idx0"], ["d0"], axis=0),
            node("Unsqueeze", ["d0", "ax0"], ["d0u"]),
            node("Concat", ["d0u", "minus1"], ["target"], axis=0),
            node("Reshape", ["x", "target"], ["y"]),
        ],
        {
            "idx0": np.array(0, np.int64), "ax0": np.array([0], np.int64),
            "minus1": np.array([-1], np.int64),
        },
        [("x", (4, 5, 6))],
        [("y", (4, 30))],
    )
    x = np.random.default_rng(0).normal(size=(4, 5, 6)).astype(np.float32)
    out = jax.jit(fn)(fn.params, x)
    np.testing.assert_allclose(np.asarray(out), x.reshape(4, 30), atol=0)


def test_if_static_condition_folds(tmp_path):
    then_g = OnnxGraph("then", [node("Mul", ["x", "twoc"], ["o"])],
                       [OnnxTensor("twoc", np.float32(2.0).reshape(()))], [],
                       [OnnxValueInfo("o", ())])
    else_g = OnnxGraph("else", [node("Add", ["x", "onec"], ["o2"])],
                       [OnnxTensor("onec", np.float32(1.0).reshape(()))], [],
                       [OnnxValueInfo("o2", ())])
    fn = build(
        str(tmp_path / "if.onnx"),
        [
            node("Equal", ["sr", "sr16k"], ["is16k"]),
            node("If", ["is16k"], ["y"], then_branch=then_g, else_branch=else_g),
        ],
        {"sr16k": np.array(16000, np.int64)},
        [("x", (3,)), ("sr", ())],
        [("y", (3,))],
    )
    x = np.arange(3, dtype=np.float32)
    out = fn(fn.params, x, np.array(16000, np.int64))
    np.testing.assert_allclose(np.asarray(out), x * 2)
    out = fn(fn.params, x, np.array(8000, np.int64))
    np.testing.assert_allclose(np.asarray(out), x + 1)


def test_google_style_embedding_graph(tmp_path):
    """NHWC input -> Transpose -> conv stack -> [n,1,1,96] like the frozen
    Google speech-embedding model (reference embeddings.py:23-54; browser
    speech-embedding.ts:148-152 reads output 'conv2d_19')."""
    torch.manual_seed(3)
    c1 = torch.nn.Conv2d(1, 24, (5, 5), stride=(2, 2), padding=(2, 2))
    c2 = torch.nn.Conv2d(24, 48, (5, 5), stride=(2, 2), padding=(2, 2))
    c3 = torch.nn.Conv2d(48, 96, (19, 8))  # valid conv down to 1x1
    x_nhwc = torch.randn(4, 76, 32, 1)
    with torch.no_grad():
        h = x_nhwc.permute(0, 3, 1, 2)
        ref = c3(torch.relu(c2(torch.relu(c1(h))))).permute(0, 2, 3, 1)

    fn = build(
        str(tmp_path / "emb.onnx"),
        [
            node("Transpose", ["input"], ["t"], perm=[0, 3, 1, 2]),
            node("Conv", ["t", "w1", "b1"], ["h1"], strides=[2, 2], pads=[2, 2, 2, 2],
                 kernel_shape=[5, 5]),
            node("Relu", ["h1"], ["r1"]),
            node("Conv", ["r1", "w2", "b2"], ["h2"], strides=[2, 2], pads=[2, 2, 2, 2],
                 kernel_shape=[5, 5]),
            node("Relu", ["r2_in := h2" if False else "h2"], ["r2"]),
            node("Conv", ["r2", "w3", "b3"], ["h3"], kernel_shape=[19, 8]),
            node("Transpose", ["h3"], ["conv2d_19"], perm=[0, 2, 3, 1]),
        ],
        {
            "w1": t2n(c1.weight), "b1": t2n(c1.bias),
            "w2": t2n(c2.weight), "b2": t2n(c2.bias),
            "w3": t2n(c3.weight), "b3": t2n(c3.bias),
        },
        [("input", ("n", 76, 32, 1))],
        [("conv2d_19", ("n", 1, 1, 96))],
    )
    out = np.asarray(fn(fn.params, x_nhwc.numpy()))
    assert out.shape == (4, 1, 1, 96)
    np.testing.assert_allclose(out, t2n(ref), atol=2e-5)
