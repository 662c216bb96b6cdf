"""End-to-end CLI tests (train on pre-seeded features -> convert -> predict -> listen)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from heybuddy_tpu.cli import main
from heybuddy_tpu.models.featurizer import get_speech_embeddings
from heybuddy_tpu.models.formant import FormantSynthesizer
from heybuddy_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def seeded_env(tmp_path_factory):
    """Pre-seed the dataset cache with real (formant TTS) features so `train`
    skips the slow generation path; produce a positive test wav."""
    root = tmp_path_factory.mktemp("cli")
    data_dir = str(root / "data")
    os.makedirs(data_dir, exist_ok=True)
    os.environ["HEYBUDDY_DATASET_DIR"] = data_dir
    os.environ["HEYBUDDY_OFFLINE"] = "1"

    synth = FormantSynthesizer()
    embeddings = get_speech_embeddings()

    def clips(texts, speakers):
        out = []
        for text in texts:
            for spk in speakers:
                audio = synth.synthesize(text, speaker=spk)
                padded = np.zeros(23040, dtype=np.float32)
                padded[: min(len(audio), 23040)] = audio[:23040]
                out.append(padded)
        return np.stack(out)

    pos_audio = clips(["hey buddy"], range(24))
    neg_audio = clips(["hey body", "hay bunny", "say study"], range(8))
    pos = embeddings(pos_audio)
    neg = embeddings(neg_audio)

    for name, feats in [
        ("hey-buddy", pos),
        ("hey-buddy-adversarial", neg),
        ("hey-buddy-validation", pos.copy()),
        ("hey-buddy-testing", pos.copy()),
        ("hey-buddy-adversarial-testing", neg.copy()),
    ]:
        np.save(os.path.join(data_dir, f"{name}.npy"), feats.astype(np.float32))

    wav_path = str(root / "positive.wav")
    clip = synth.synthesize("hey buddy", speaker=3)
    audio = np.concatenate([np.zeros(16000, np.float32), clip, np.zeros(32000, np.float32)])
    write_wav(wav_path, audio, 16000)
    return {"root": root, "data_dir": data_dir, "wav": wav_path}


def test_cli_train_convert_predict_listen(seeded_env):
    runner = CliRunner()
    ckpt_dir = str(seeded_env["root"] / "ckpt")

    result = runner.invoke(
        main,
        [
            "train", "hey buddy",
            "--positive-samples", "24", "--adversarial-samples", "24",
            "--validation-samples", "12",
            "--validation-stream-negative-samples", "8",
            "--testing-positive-samples", "12", "--testing-adversarial-samples", "12",
            "--steps", "40", "--stages", "1", "--validation-steps", "30",
            "--checkpoint-steps", "1000",
            "--positive-batch-size", "12", "--adversarial-batch-size", "12",
            "--negative-batch-size", "0", "--training-no-default-dataset",
            "--num-batch-threads", "1", "--checkpoint-dir", ckpt_dir,
            "--no-mesh",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    final = os.path.join(ckpt_dir, "hey-buddy_final.npz")
    assert os.path.exists(final)

    onnx_path = str(seeded_env["root"] / "hey-buddy.onnx")
    result = runner.invoke(main, ["convert", final, onnx_path], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert os.path.exists(onnx_path)

    # predict runs the full featurize+classify path on the wav for both formats
    for checkpoint in (final, onnx_path):
        result = runner.invoke(
            main, ["predict", checkpoint, seeded_env["wav"], "--threshold", "0.99"],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output

    from heybuddy_tpu.runtime.listen import run_listen

    detections = run_listen(
        [final], threshold=0.0, buffer_size=8000, input_wav=seeded_env["wav"], max_chunks=6
    )
    assert isinstance(detections, list)


def test_cli_combine(seeded_env, tmp_path):
    runner = CliRunner()
    a = np.random.default_rng(0).normal(size=(5, 16, 96)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(3, 16, 96)).astype(np.float32)
    np.save(tmp_path / "shard-0.npy", a)
    np.save(tmp_path / "shard-1.npy", b)
    target = str(tmp_path / "combined.npy")
    result = runner.invoke(
        main,
        ["combine", str(tmp_path / "shard-0.npy"), str(tmp_path / "shard-1.npy"), target],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    combined = np.load(target)
    assert combined.shape == (8, 16, 96)
    np.testing.assert_array_equal(combined[:5], a)


def test_cli_extract_local_files(seeded_env, tmp_path):
    synth = FormantSynthesizer()
    for i, text in enumerate(["hello there", "good morning"]):
        audio = synth.synthesize(text, speaker=i)
        write_wav(str(tmp_path / f"clip{i}.wav"), audio, 16000)
        with open(tmp_path / f"clip{i}.txt", "w") as f:
            f.write(text)
    runner = CliRunner()
    out_dir = str(tmp_path / "shards")
    result = runner.invoke(
        main,
        [
            "extract", "local-test", str(tmp_path / "clip*.wav"),
            "--local-files", "--directory", out_dir, "--samples-per-file", "100",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    shards = [f for f in os.listdir(out_dir) if f.endswith(".npy")]
    assert shards
    data = np.load(os.path.join(out_dir, shards[0]))
    assert data.shape[1:] == (17, 96)
