"""
Feature-space coherence guards.

Every feature store is produced by SOME embedding; mixing stores from two
different embeddings in one training run makes the classifier separate them
by space artifact instead of content (VERDICT r1 missing #2). Three rules:

1. Locally-generated caches carry a ``<name>.space.json`` sidecar recording
   the producing embedding's ``space_id`` (weights hash + backend,
   models/embedding_net.embedding_space_id). A cache whose sidecar mismatches
   the active embedding is stale and regenerated (set
   ``HEYBUDDY_KEEP_STALE_FEATURES=1`` to keep it anyway).
2. The hosted precalculated sets (reference precalculated.py:629-649) were
   featurized by the reference's frozen Google embedding. They are wired into
   training only when the active featurizer IS that model (the
   ``HEYBUDDY_EMBEDDING_ONNX`` import path); otherwise they are disabled with
   a loud warning (override: ``HEYBUDDY_ALLOW_SPACE_MISMATCH=1``).
3. Exclude-phrase filtering of labeled hosted shards requires BERT-compatible
   token ids; with the offline hash tokenizer the ids never match and the
   filter silently no-ops — warn when that combination occurs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from heybuddy_tpu.utils.log import logger

__all__ = [
    "active_space",
    "write_space_sidecar",
    "read_space_sidecar",
    "check_cache_space",
    "hosted_sets_compatible",
]


def active_space() -> Dict[str, str]:
    """The active featurizer's space descriptor."""
    from heybuddy_tpu.models.featurizer import get_speech_embeddings

    emb = get_speech_embeddings()
    return {"space_id": emb.space_id, "backend": emb.backend}


def _sidecar_path(npy_path: str) -> str:
    return os.path.splitext(npy_path)[0] + ".space.json"


def write_space_sidecar(npy_path: str, space: Optional[Dict[str, str]] = None) -> None:
    space = space or active_space()
    with open(_sidecar_path(npy_path), "w") as f:
        json.dump(space, f)


def read_space_sidecar(npy_path: str) -> Optional[Dict[str, Any]]:
    path = _sidecar_path(npy_path)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def check_cache_space(npy_path: str) -> bool:
    """
    True when ``npy_path`` may be used with the active embedding: no store,
    matching sidecar, or a legacy store without a sidecar (tolerated with a
    warning, then stamped). False means the cache is stale and should be
    regenerated.
    """
    if not os.path.exists(npy_path):
        return True
    sidecar = read_space_sidecar(npy_path)
    current = active_space()
    if sidecar is None:
        logger.warning(
            f"Feature store {os.path.basename(npy_path)} predates space tracking; "
            f"stamping it with the active embedding space {current['space_id']}. "
            "Delete the .npy if it was produced by a different embedding."
        )
        try:
            write_space_sidecar(npy_path, current)
        except OSError as ex:
            # Read-only dataset dirs (baked-in/shared shards) must still be
            # usable: the stamp is an optimization, not a requirement.
            logger.warning(f"Could not stamp {os.path.basename(npy_path)}: {ex}")
        return True
    if sidecar.get("space_id") == current["space_id"]:
        return True
    if os.environ.get("HEYBUDDY_KEEP_STALE_FEATURES"):
        logger.warning(
            f"Feature store {os.path.basename(npy_path)} was produced by embedding "
            f"space {sidecar.get('space_id')} but the active space is "
            f"{current['space_id']}; keeping it because HEYBUDDY_KEEP_STALE_FEATURES "
            "is set. Training on mixed feature spaces degrades the classifier."
        )
        return True
    logger.warning(
        f"Feature store {os.path.basename(npy_path)} was produced by embedding space "
        f"{sidecar.get('space_id')} (backend {sidecar.get('backend')}) but the active "
        f"space is {current['space_id']} (backend {current['backend']}); regenerating. "
        "Set HEYBUDDY_KEEP_STALE_FEATURES=1 to keep stale caches."
    )
    return False


def hosted_sets_compatible(context: str, local_path: Optional[str] = None) -> bool:
    """
    Whether the reference-hosted precalculated sets (Google-embedding feature
    space) are coherent with the active featurizer. Logs the decision.

    ``local_path``: when the file already exists locally WITH a sidecar
    matching the active space, it is a locally-produced store that merely
    shares the hosted name — always allowed.
    """
    from heybuddy_tpu.models.featurizer import get_speech_embeddings

    if local_path and os.path.exists(local_path):
        sidecar = read_space_sidecar(local_path)
        if sidecar is not None:
            if sidecar.get("space_id") == active_space()["space_id"]:
                return True
            # A sidecar-stamped local file in a DIFFERENT space is
            # incompatible no matter which backend is active — falling
            # through to the backend check would wire e.g. a trunkpool-space
            # store into onnx-space training (the exact mix this module
            # exists to block).
            if os.environ.get("HEYBUDDY_ALLOW_SPACE_MISMATCH"):
                logger.warning(
                    f"{context}: {os.path.basename(local_path)} was produced in "
                    f"embedding space {sidecar.get('space_id')}, not the active "
                    "space; proceeding because HEYBUDDY_ALLOW_SPACE_MISMATCH is set."
                )
                return True
            logger.warning(
                f"{context}: {os.path.basename(local_path)} was produced in "
                f"embedding space {sidecar.get('space_id')}, which does not match "
                "the active embedding — disabling it. Delete the file to "
                "regenerate/redownload, or set HEYBUDDY_ALLOW_SPACE_MISMATCH=1."
            )
            return False

    emb = get_speech_embeddings()
    if emb.backend == "onnx":
        return True
    if os.environ.get("HEYBUDDY_ALLOW_SPACE_MISMATCH"):
        logger.warning(
            f"{context}: hosted precalculated features are in the reference Google "
            f"embedding space but the active embedding is '{emb.backend}' "
            f"({emb.space_id}); proceeding because HEYBUDDY_ALLOW_SPACE_MISMATCH is "
            "set. Expect the classifier to key on the space difference."
        )
        return True
    logger.warning(
        f"{context}: hosted precalculated features are in the reference Google "
        f"embedding space, which does not match the active embedding "
        f"'{emb.backend}' ({emb.space_id}) — disabling them. Point "
        "HEYBUDDY_EMBEDDING_ONNX at the reference speech-embedding.onnx to use "
        "hosted sets, use --synthetic-negative-samples for offline negatives, or "
        "set HEYBUDDY_ALLOW_SPACE_MISMATCH=1 to force."
    )
    return False
