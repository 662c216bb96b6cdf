"""Text layer: G2P goldens, adversarial search, tokenizer invariants."""

import itertools

import numpy as np

from heybuddy_tpu.text.adversarial import AdversarialTextGenerator, replace_phonemes
from heybuddy_tpu.text.phonemizer import SimplePhonemizer, get_phonemizer
from heybuddy_tpu.text.tokens import BERTTokenizer


def test_phonemizer_golden_strings():
    """Reference tests/test_phonemizer.py golden output."""
    phonemizer = get_phonemizer()
    assert phonemizer("hello world") == "[HH][AH][L][OW] [W][ER][L][D]"


def test_phonemizer_basic_words():
    p = SimplePhonemizer()
    assert p("hey buddy") == "[HH][EY] [B][AH][D][IY]"
    # every output phone is bracketed ARPAbet
    out = p("please turn on the lights")
    assert out.count("[") == out.count("]")
    assert out


def test_replace_phonemes_combinations():
    result = replace_phonemes(["A", "B", "C"], max_replace=1, replace_char="X")
    assert result == ["X B C", "A X C", "A B X"]
    result2 = replace_phonemes(["A", "B", "C"], max_replace=2, replace_char="X")
    assert "X X C" in result2 and len(result2) == 6


def test_adversarial_generator_determinism_and_difference():
    generator = AdversarialTextGenerator()
    first = list(itertools.islice(generator("hello world", seed=42), 10))
    second = list(itertools.islice(generator("hello world", seed=42), 10))
    assert first == second
    assert all(text != "hello world" for text in first)
    assert len(first) == 10
    # different seed -> different stream
    third = list(itertools.islice(generator("hello world", seed=43), 10))
    assert first != third


def test_adversarial_candidates_phonetically_near():
    generator = AdversarialTextGenerator()
    words = generator.adversarial_words("buddy")
    assert words
    assert "buddy" not in words


def test_adversarial_pool_distinct_and_covers_minimal_pairs():
    """N requested phrases = N distinct phrases (duplicates used to collapse a
    60-draw pool to ~half its nominal diversity), and the offline lexicon
    reaches the production near-collisions of 'hey buddy' (one-phone edits
    like bunny/buggy)."""
    generator = AdversarialTextGenerator()
    pool = list(generator("hey buddy", num_samples=150, seed=1077))
    assert len(pool) == 150
    assert len(set(pool)) == 150
    second_words = {t.split()[-1] for t in pool}
    assert "bunny" in second_words or "buggy" in second_words


def test_tokenizer_fixed_length_and_consistency():
    tokenizer = BERTTokenizer(length=96)
    ids = tokenizer("hello world")
    assert ids.shape == (96,)
    assert ids.dtype == np.int64
    assert (ids[:2] > 0).all() and (ids[2:] == 0).all()
    np.testing.assert_array_equal(ids, tokenizer("hello world"))
    # decoding round-trips the words (hash backend keeps a reverse map)
    assert tokenizer.decode(ids) == "hello world"


def test_tokenizer_disjoint_phrases_disjoint_tokens():
    tokenizer = BERTTokenizer()
    a = set(int(t) for t in tokenizer("hello world") if t != 0)
    b = set(int(t) for t in tokenizer("completely different utterance") if t != 0)
    assert a.isdisjoint(b)


def test_espeak_ipa_to_arpabet_mapping():
    """The IPA->ARPAbet table converts espeak output without the library."""
    from heybuddy_tpu.text.espeak import EspeakPhonemizer

    # espeak-ng "hello world" IPA: h@l'oU w'3:ld -> həlˈoʊ wˈɜːld
    assert EspeakPhonemizer.ipa_word_to_arpabet("həlˈoʊ") == ["HH", "AH", "L", "OW"]
    assert EspeakPhonemizer.ipa_word_to_arpabet("wˈɜːld") == ["W", "ER", "L", "D"]
    # espeak-ng "buddy": b'Vdi -> bˈʌdi
    assert EspeakPhonemizer.ipa_word_to_arpabet("bˈʌdi") == ["B", "AH", "D", "IY"]
    # diphthongs and affricates take longest-match precedence
    assert EspeakPhonemizer.ipa_word_to_arpabet("tʃaɪld") == ["CH", "AY", "L", "D"]
    # stress/length marks are ignored, unknown symbols dropped
    assert EspeakPhonemizer.ipa_word_to_arpabet("ˈˌːˑ") == []


def test_espeak_binding_when_available():
    """Live binding golden (runs only where libespeak-ng is installed)."""
    import pytest

    from heybuddy_tpu.text.espeak import EspeakPhonemizer

    if not EspeakPhonemizer.available():
        pytest.skip("libespeak-ng not installed")
    p = EspeakPhonemizer()
    assert p("hello world") == "[HH][AH][L][OW] [W][ER][L][D]"


def test_get_phonemizer_simple_override(monkeypatch):
    """HEYBUDDY_PHONEMIZER=simple forces the rule engine."""
    import heybuddy_tpu.text.phonemizer as pz

    monkeypatch.setenv("HEYBUDDY_PHONEMIZER", "simple")
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)
    assert isinstance(pz.get_phonemizer(), SimplePhonemizer)
    monkeypatch.setattr(pz, "_GLOBAL_PHONEMIZER", None)  # reset for other tests


def test_piper_interop_maps():
    """Bundled piper data tables: structure, sentinels, and coverage."""
    from heybuddy_tpu.text.piper_maps import piper_phoneme_id_map, piper_speaker_id_map

    pmap = piper_phoneme_id_map()
    assert pmap["_"] == [0] and pmap["^"] == [1] and pmap["$"] == [2] and pmap[" "] == [3]
    # one id per symbol, ids unique
    ids = [v[0] for v in pmap.values()]
    assert len(ids) == len(set(ids)) == len(pmap) >= 130
    # every IPA char the framework's ARPAbet bridge emits is mapped
    from heybuddy_tpu.models.tts import _ARPA_TO_IPA

    for ipa in _ARPA_TO_IPA.values():
        for char in ipa:
            assert char in pmap, f"unmapped IPA char {char!r}"

    smap = piper_speaker_id_map()
    assert len(smap) == 904
    assert set(smap.values()) == set(range(904))


def test_vits_tts_defaults_to_piper_maps(monkeypatch):
    """Bare-checkpoint VITS TTS uses the piper tables and resolves speakers."""
    monkeypatch.delenv("HEYBUDDY_TTS_CHECKPOINT", raising=False)
    monkeypatch.delenv("HEYBUDDY_TTS_CONFIG", raising=False)
    from heybuddy_tpu.models.tts import VitsTTS

    tts = VitsTTS()
    assert tts.phoneme_id_map["ɹ"] == [88]
    ids = tts.phonemize_ids("hi")
    assert ids[0] == 1 and ids[-1] == 2 and len(ids) > 4
    assert tts.resolve_speaker(5) == 5
    assert tts.resolve_speaker("3922") == 0  # LibriTTS speaker name


def test_adversarial_generator_terminates_without_candidates():
    """A word with no phonetic neighbors must not hang the sampler
    (regression: 'wednesday' looped forever in cluster text builds)."""
    from heybuddy_tpu.text.adversarial import AdversarialTextGenerator

    gen = AdversarialTextGenerator()
    out = list(gen("wednesday", num_samples=3, seed=0))
    assert out == [] or all(t != "wednesday" for t in out)


def test_rule_g2p_accuracy_floor():
    """Rule-G2P word accuracy on the curated golden lexicon must not regress
    (measured 0.995 word / 0.001 PER late round 3 on the 218-word expanded
    set; scripts/g2p_accuracy.py documents the expansion protocol)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "g2p_accuracy.py",
    )
    spec = importlib.util.spec_from_file_location("g2p_accuracy", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from heybuddy_tpu.text.phonemizer import _g2p_word

    result = mod.score(sorted(mod.GOLDEN.items()), _g2p_word)
    assert result["word_accuracy"] >= 0.97, result["worst"][:10]
    assert result["phone_error_rate"] <= 0.01, result["worst"][:10]


def test_prefix_negative_texts():
    """Prefix negatives: the wake phrase's exact onset continuing into
    NON-target words ("hey bud-" -> budget/but/bus...), ranked deepest-onset
    first. Words that extend the full target word are excluded — rejecting
    "hey buddies" would teach rejection of the phrase itself."""
    from heybuddy_tpu.text.adversarial import prefix_negative_texts

    texts = prefix_negative_texts("hey buddy", num_samples=32, seed=0)
    assert len(texts) == 32
    assert len(set(texts)) == 32
    assert "hey buddy" not in texts
    for t in texts:
        words = t.split()
        assert "buddy" not in words and "buddies" not in words, t
    # Deep-onset candidates dominate: most texts keep the first word intact
    # and diverge inside the second.
    kept_onset = [t for t in texts if t.startswith("hey ")]
    assert len(kept_onset) >= len(texts) // 2
    # The measured residual class is covered: at least one b-vowel divergence.
    assert any(t.split()[1][0] == "b" for t in kept_onset)
    # Seeded determinism (pool order feeds seeded TTS rendering).
    assert texts == prefix_negative_texts("hey buddy", num_samples=32, seed=0)
    # Degenerate phrases yield gracefully.
    assert prefix_negative_texts("a", num_samples=4, seed=0) == []


def test_single_swap_collision_texts():
    """Round-5 FAR channel: every emitted text differs from the phrase in
    EXACTLY one word (the attribution-measured failure class), positions are
    round-robined, excludes are honored, and pools are seed-deterministic."""
    from heybuddy_tpu.text.adversarial import single_swap_collision_texts

    words = "hey buddy".split()
    texts = single_swap_collision_texts("hey buddy", num_samples=40, seed=0)
    assert len(texts) == 40
    assert len(set(texts)) == 40
    swapped_positions = set()
    for t in texts:
        tw = t.split()
        assert len(tw) == len(words)
        diffs = [i for i, (a, b) in enumerate(zip(tw, words)) if a != b]
        assert len(diffs) == 1, t
        swapped_positions.add(diffs[0])
    assert swapped_positions == {0, 1}  # both positions covered

    # exclude removes exact strings (the held-out-pool contract)
    banned = texts[:8]
    rest = single_swap_collision_texts(
        "hey buddy", num_samples=40, seed=0, exclude=banned
    )
    assert not (set(rest) & set(banned))

    # deterministic per seed, varies across seeds
    assert texts == single_swap_collision_texts("hey buddy", num_samples=40, seed=0)
    assert texts != single_swap_collision_texts("hey buddy", num_samples=40, seed=1)

    # neighbor-less degenerate word: no infinite loop, bounded output
    few = single_swap_collision_texts("wednesday", num_samples=8, seed=0)
    assert all(t != "wednesday" for t in few)


def test_collision_texts_max_swaps():
    """Round-5 depth-2 extension: max_swaps=2 interleaves double swaps with
    the singles, max_swaps=1 stays byte-identical to the v25 channel, and a
    single-word phrase degrades gracefully (no depth-2 combos exist)."""
    from heybuddy_tpu.text.adversarial import single_swap_collision_texts

    words = "hey buddy".split()
    singles = single_swap_collision_texts("hey buddy", num_samples=24, seed=0)
    mixed = single_swap_collision_texts(
        "hey buddy", num_samples=24, seed=0, max_swaps=2
    )
    assert len(mixed) == 24
    assert len(set(mixed)) == 24

    def n_diffs(t):
        return sum(a != b for a, b in zip(t.split(), words))

    depths = [n_diffs(t) for t in mixed]
    assert set(depths) == {1, 2}
    # round-robin interleave: half each for a 2-word phrase
    assert depths.count(2) == 12
    # the depth-1 subsequence is exactly the v25 single-swap order
    assert [t for t in mixed if n_diffs(t) == 1] == singles[:12]
    # deterministic, and the explicit default matches the two-arg call
    assert singles == single_swap_collision_texts(
        "hey buddy", num_samples=24, seed=0, max_swaps=1
    )
    # exclude is honored across depths
    banned = mixed[:6]
    rest = single_swap_collision_texts(
        "hey buddy", num_samples=24, seed=0, exclude=banned, max_swaps=2
    )
    assert not (set(rest) & set(banned))
    # 1-word phrase: max_swaps=2 cannot produce depth-2 texts, still works
    one = single_swap_collision_texts("buddy", num_samples=6, seed=0, max_swaps=2)
    assert all(len(t.split()) == 1 and t != "buddy" for t in one)
