"""
Piper interop data: the default phoneme-id and speaker-id maps.

These are pure DATA tables bundled as JSON assets, required byte-for-byte for
interoperability with real piper checkpoints:

* ``piper_phoneme_id_map`` — piper-phonemize's published default IPA->id map
  (159 symbols: pad=0 bos=1 eos=2, then IPA letters/diacritics). Any piper
  voice trained with piper-phonemize expects exactly these ids (reference
  ships the same table as ``piper/phoneme_ids.py:1``).
* ``piper_speaker_id_map`` — the 904-speaker LibriTTS voice's speaker-name ->
  id table (reference ``piper/speaker_ids.py:1``), used to resolve named
  speakers when a voice config JSON is not available.

A voice's own ``config.json`` always takes precedence (models/tts.py); these
are the first-class fallbacks so phonemization and speaker selection work
with bare ``.ckpt``/``.onnx`` files.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List

__all__ = ["piper_phoneme_id_map", "piper_speaker_id_map"]

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


@functools.lru_cache(maxsize=None)
def piper_phoneme_id_map() -> Dict[str, List[int]]:
    """IPA character -> [id] (piper-phonemize default table)."""
    with open(os.path.join(_ASSET_DIR, "piper_phoneme_id_map.json"), encoding="utf-8") as f:
        return json.load(f)


@functools.lru_cache(maxsize=None)
def piper_speaker_id_map() -> Dict[str, int]:
    """LibriTTS speaker name -> speaker id (904 speakers)."""
    with open(os.path.join(_ASSET_DIR, "piper_speaker_id_map.json"), encoding="utf-8") as f:
        return json.load(f)
