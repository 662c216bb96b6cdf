"""Neural-G2P option: model, training, checkpoint, phonemizer contract.

Trained-model parity with the reference's DeepPhonemizer path
(reference phonemizer.py:15-50); see heybuddy_tpu/text/neural_g2p.py.
"""

import os

import numpy as np
import pytest

from heybuddy_tpu.text.neural_g2p import (
    ARPABET,
    NeuralG2P,
    NeuralPhonemizer,
    encode_phones,
    encode_word,
    train_neural_g2p,
)

TABLE = {
    "hello": ["HH", "AH", "L", "OW"],
    "world": ["W", "ER", "L", "D"],
    "buddy": ["B", "AH", "D", "IY"],
    "hey": ["HH", "EY"],
    "cat": ["K", "AE", "T"],
    "dog": ["D", "AO", "G"],
    "fish": ["F", "IH", "SH"],
    "water": ["W", "AO", "T", "ER"],
}


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    model, params = train_neural_g2p(
        TABLE, steps=350, lr=1e-3,
        model=NeuralG2P(dim=48, heads=4, layers=1), seed=0,
    )
    path = str(tmp_path_factory.mktemp("g2p") / "g2p.npz")
    model.save(params, path)
    return model, params, path


def test_encodings_roundtrip():
    chars = encode_word("hey", 8)
    assert chars.shape == (8,) and chars[3:].sum() == 0 and (chars[:3] > 0).all()
    ph = encode_phones(["HH", "EY"], 6)
    assert [ARPABET[i - 1] for i in ph if i > 0] == ["HH", "EY"]


def test_training_memorizes_table(trained):
    model, params, _ = trained
    decoded = model.decode(params, sorted(TABLE))
    got = dict(zip(sorted(TABLE), decoded))
    exact = sum(got[w] == TABLE[w] for w in TABLE)
    assert exact >= len(TABLE) - 1, got


def test_checkpoint_roundtrip(trained):
    model, params, path = trained
    model2, params2 = NeuralG2P.load(path)
    assert model2.config == model.config
    a = model.decode(params, ["hello", "buddy"])
    b = model2.decode(params2, ["hello", "buddy"])
    assert a == b


def test_phonemizer_contract(trained):
    _, _, path = trained
    ph = NeuralPhonemizer(weights=path)
    out = ph("hello world")
    words = out.split(" ")
    assert len(words) == 2
    for w in words:
        assert w.startswith("[") and w.endswith("]")
    # memoized second call is identical
    assert ph("hello world") == out


def test_phonemizer_missing_weights_raise():
    with pytest.raises(FileNotFoundError):
        NeuralPhonemizer(weights="/nonexistent/g2p.npz")


def test_phonemizer_defaults_to_bundled_asset(monkeypatch):
    monkeypatch.delenv("HEYBUDDY_G2P_WEIGHTS", raising=False)
    ph = NeuralPhonemizer()  # bundled assets/g2p-neural.npz
    assert ph.word_phones("buddy")  # decodes through the numpy path


def test_get_phonemizer_neural_backend(trained, monkeypatch):
    import heybuddy_tpu.text.phonemizer as pz

    _, _, path = trained
    monkeypatch.setenv("HEYBUDDY_PHONEMIZER", "neural")
    monkeypatch.setenv("HEYBUDDY_G2P_WEIGHTS", path)
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)
    got = pz.get_phonemizer()
    assert isinstance(got, NeuralPhonemizer)
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)


def test_numpy_forward_matches_jax(trained):
    # NeuralPhonemizer deploys the pure-numpy forward (TTS producer threads
    # must not dispatch device compute) — it must agree with the jitted path.
    model, params, _ = trained
    words = sorted(TABLE) + ["zephyr", "qat"]
    np_params = {k: v for k, v in params.items()}
    logits_np = model.apply_np(
        np_params, np.stack([
            __import__("heybuddy_tpu.text.neural_g2p", fromlist=["encode_word"])
            .encode_word(w, model.max_word) for w in words]))
    assert np.isfinite(logits_np).all()
    assert model.decode(params, words) == model.decode(params, words, numpy=True)


def test_word_phones_contract(trained):
    _, _, path = trained
    ph = NeuralPhonemizer(weights=path)
    phones = ph.word_phones("buddy")
    assert isinstance(phones, list)
    assert all(p in ARPABET for p in phones)


def test_provenance_tags_non_default_backend(trained, monkeypatch):
    import heybuddy_tpu.text.phonemizer as pz
    from heybuddy_tpu.data.space import tts_provenance

    _, _, path = trained
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)
    default_tag = tts_provenance("formant")
    assert "g2p:" not in default_tag  # rule engine stays untagged
    monkeypatch.setenv("HEYBUDDY_PHONEMIZER", "neural")
    monkeypatch.setenv("HEYBUDDY_G2P_WEIGHTS", path)
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)
    assert tts_provenance("formant") == default_tag + ";g2p:neural"
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)


def test_padding_invariance(trained):
    # A word decodes the same regardless of what else is in the batch —
    # masking must prevent cross-batch or pad leakage.
    model, params, _ = trained
    alone = model.decode(params, ["buddy"])
    batched = model.decode(params, ["buddy", "water", "hello"])
    assert alone[0] == batched[0]
