"""
Tokenizer for labeled feature shards.

Capability parity with reference ``tokens.py`` (BERT-base-uncased via HF
``tokenizers``, CLS/SEP stripped, padded/truncated to a fixed length). The
token ids label negative-dataset transcripts so training can exclude rows that
contain the wake phrase (reference precalculated.py:520-533) — what matters is
a *consistent* text->ids mapping between extract time and train time.

Resolution order:
1. A real WordPiece vocab: ``HEYBUDDY_TOKENIZER`` env pointing at a
   ``tokenizer.json`` or ``vocab.txt`` (exact BERT ids, matches the
   reference's shards).
2. Offline fallback: a deterministic hash tokenizer (stable across runs and
   machines via md5). Self-consistent for exclude-filtering of locally
   extracted shards; NOT id-compatible with shards produced with real BERT.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional

import numpy as np

from heybuddy_tpu.utils.log import logger

__all__ = ["PretrainedTokenizer", "BERTTokenizer", "HashWordTokenizer"]

DEFAULT_TOKEN_LENGTH = 96


class HashWordTokenizer:
    """
    Deterministic offline tokenizer: lowercase word -> stable id in
    [1000, 29000). Keeps a reverse map for in-session decode.
    """

    vocab_size = 30522  # BERT-base size, for range compatibility
    pad_token_id = 0

    def __init__(self) -> None:
        self._reverse: Dict[int, str] = {}

    def _word_id(self, word: str) -> int:
        digest = hashlib.md5(word.encode("utf-8")).digest()
        token = 1000 + int.from_bytes(digest[:4], "little") % 28000
        self._reverse[token] = word
        return token

    def encode(self, text: str) -> List[int]:
        words = [w for w in _normalize(text).split() if w]
        return [self._word_id(w) for w in words]

    def decode(self, ids: List[int]) -> str:
        return " ".join(self._reverse.get(int(i), "[UNK]") for i in ids if int(i) != 0)


def _normalize(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9']", " ", text.lower())).strip()


class PretrainedTokenizer:
    """
    Fixed-length tokenizer wrapper (reference tokens.py:14-66): strips special
    tokens, truncates/pads to ``length``, returns int64 numpy arrays.
    """

    def __init__(self, length: int = DEFAULT_TOKEN_LENGTH) -> None:
        self.length = length
        self._backend = self._resolve_backend()

    @staticmethod
    def _resolve_backend():
        path = os.environ.get("HEYBUDDY_TOKENIZER")
        if path and os.path.exists(path):
            try:
                from tokenizers import Tokenizer
                from tokenizers.models import WordPiece

                if path.endswith(".json"):
                    return Tokenizer.from_file(path)
                # vocab.txt -> basic WordPiece with bert-style pre-tokenization
                from tokenizers import normalizers, pre_tokenizers

                vocab: Dict[str, int] = {}
                with open(path, encoding="utf-8") as f:
                    for i, line in enumerate(f):
                        vocab[line.rstrip("\n")] = i
                tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]"))
                tok.normalizer = normalizers.BertNormalizer()
                tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
                return tok
            except Exception as ex:  # fall back below
                logger.warning(f"Failed to load tokenizer from {path}: {ex}")
        return HashWordTokenizer()

    @property
    def is_wordpiece(self) -> bool:
        return not isinstance(self._backend, HashWordTokenizer)

    def __call__(self, text: str, length: Optional[int] = None) -> np.ndarray:
        length = length if length is not None else self.length
        if isinstance(self._backend, HashWordTokenizer):
            ids = self._backend.encode(text)
        else:
            encoding = self._backend.encode(text)
            special = {"[CLS]", "[SEP]", "[PAD]"}
            ids = [
                i
                for i, tok in zip(encoding.ids, encoding.tokens)
                if tok not in special
            ]
        ids = ids[:length]
        out = np.zeros(length, dtype=np.int64)
        out[: len(ids)] = ids
        return out

    def decode(self, ids: np.ndarray) -> str:
        ids_list = [int(i) for i in np.asarray(ids).flatten() if int(i) != 0]
        if isinstance(self._backend, HashWordTokenizer):
            return self._backend.decode(ids_list)
        return self._backend.decode(ids_list)


class BERTTokenizer(PretrainedTokenizer):
    """Default tokenizer used for labeled feature shards (reference tokens.py:68)."""

    def __init__(self, length: int = DEFAULT_TOKEN_LENGTH) -> None:
        super().__init__(length=length)
