"""Browser-deployment ONNX assets: mel spectrogram and embedding graphs."""

import numpy as np

from heybuddy_tpu.export.onnx_export import export_embedding_net, export_mel_spectrogram
from heybuddy_tpu.export.onnx_numpy import OnnxRunner
from heybuddy_tpu.export.onnx_proto import parse_model
from heybuddy_tpu.models import embedding_net
from heybuddy_tpu.ops.melspec import mel_spectrogram


def test_mel_spectrogram_export_matches_jax(tmp_path):
    path = str(tmp_path / "mel.onnx")
    export_mel_spectrogram(path)
    runner = OnnxRunner.from_file(path)
    audio = np.random.default_rng(0).normal(0, 1000.0, (1, 17280)).astype(np.float32)
    onnx_out = runner(input=audio)["output"]
    jax_out = np.asarray(mel_spectrogram(audio))
    assert onnx_out.shape == (1, 105, 32)
    np.testing.assert_allclose(onnx_out, jax_out, atol=1e-4, rtol=1e-4)


def test_mel_export_custom_length(tmp_path):
    path = str(tmp_path / "mel23040.onnx")
    export_mel_spectrogram(path, num_samples=23040)
    runner = OnnxRunner.from_file(path)
    audio = np.random.default_rng(1).normal(0, 1000.0, (1, 23040)).astype(np.float32)
    out = runner(input=audio)["output"]
    assert out.shape == (1, 141, 32)


def test_embedding_export_matches_jax(tmp_path):
    path = str(tmp_path / "emb.onnx")
    export_embedding_net(path)
    runner = OnnxRunner.from_file(path)
    windows = np.random.default_rng(2).normal(0, 1.0, (5, 76, 32)).astype(np.float32)
    onnx_out = runner(input=windows)["output"]
    params = embedding_net.default_params()
    jax_out = np.asarray(embedding_net.apply(params, windows, compute_dtype=np.float32))
    assert onnx_out.shape == (5, 96)
    np.testing.assert_allclose(onnx_out, jax_out, atol=1e-4, rtol=1e-3)


def test_embedding_export_dynamic_batch_declared(tmp_path):
    path = str(tmp_path / "emb.onnx")
    export_embedding_net(path)
    parsed = parse_model(path)
    (inp,) = parsed.graph.inputs
    assert inp.shape == ("batch", 76, 32)


def test_browser_pipeline_end_to_end(tmp_path):
    """Full browser-side numeric path: audio -> mel onnx -> window -> embedding onnx."""
    mel_path = str(tmp_path / "mel.onnx")
    emb_path = str(tmp_path / "emb.onnx")
    export_mel_spectrogram(mel_path)
    export_embedding_net(emb_path)
    mel_runner = OnnxRunner.from_file(mel_path)
    emb_runner = OnnxRunner.from_file(emb_path)

    audio = np.random.default_rng(3).normal(0, 1000.0, (1, 17280)).astype(np.float32)
    spec = mel_runner(input=audio)["output"][0]  # (105, 32)
    # browser windowing: 76 frames stride 8
    n = (spec.shape[0] - 76) // 8 + 1
    windows = np.stack([spec[i * 8 : i * 8 + 76] for i in range(n)])
    embeddings = emb_runner(input=windows.astype(np.float32))["output"]
    assert embeddings.shape == (4, 96)

    # must match the native featurizer end to end
    from heybuddy_tpu.models.featurizer import SpeechEmbeddings

    native = SpeechEmbeddings(compute_dtype=np.float32)(audio / 32767.0)
    np.testing.assert_allclose(embeddings[None], native, atol=1e-3, rtol=1e-3)
