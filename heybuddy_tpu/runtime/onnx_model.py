"""
ONNX-backed wake-word model (reference wakeword.py:463-475 WakeWordONNXModel).

Loads an exported ``.onnx`` head and exposes the same inference API as the
native models (``__call__`` over (b, 16, 96) features, ``predict``,
``predict_timecodes``). Runs on onnxruntime when installed, otherwise on the
built-in numpy evaluator.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from heybuddy_tpu.models.wakeword import WakeWordInferenceMixin

__all__ = ["WakeWordONNXModel"]


class WakeWordONNXModel(WakeWordInferenceMixin):
    def __init__(self, path: str) -> None:
        self.path = path
        self._session = None
        self._runner = None
        self._batch_ok: Any = None  # None = unverified, set on first batched call
        try:
            import onnxruntime  # type: ignore[import-not-found]

            self._session = onnxruntime.InferenceSession(
                path, providers=["CPUExecutionProvider"]
            )
        except ImportError:
            from heybuddy_tpu.export.onnx_numpy import OnnxRunner

            self._runner = OnnxRunner.from_file(path)

    def __call__(self, features: Any) -> np.ndarray:
        features = np.asarray(features, dtype=np.float32)
        if features.ndim == 2:
            features = features[None]
        # Exported graphs declare fixed batch-1 input (deployment contract),
        # but the head's ops (Flatten/MatMul/LayerNorm/...) are all
        # batch-agnostic, so the numpy runner can evaluate the whole batch in
        # one graph walk — per-row looping made multi-hour stream re-scoring
        # (~30k windows/stream-hour) prohibitively slow. Fall back to the
        # row loop if the graph turns out to bake batch-1 shapes in.
        if self._runner is not None and len(features) > 1 and self._batch_ok is not False:
            try:
                out = np.asarray(self._runner(input=features)["output"])
                if out.shape[:1] == features.shape[:1]:
                    # A preserved leading dim is necessary but not sufficient:
                    # an op that mixes across the batch (a reduction/reshape a
                    # future exporter change introduces) keeps the shape while
                    # corrupting every row. Cross-check one row against the
                    # single-row path on the first batched call and cache the
                    # verdict — multi-hour stream re-scoring rides this path.
                    if self._batch_ok is None:
                        single = np.asarray(
                            self._runner(input=features[:1])["output"]
                        )
                        self._batch_ok = bool(
                            np.allclose(out[0], single[0], rtol=1e-4, atol=1e-5)
                        )
                    if self._batch_ok:
                        return out
            except Exception:
                pass
        outputs = []
        for row in features:
            if self._session is not None:
                out = self._session.run(None, {"input": row[None]})[0]
            else:
                out = self._runner(input=row[None])["output"]
            outputs.append(out[0])
        return np.stack(outputs)
