"""
Voice activity detection.

Capability parity with reference ``vad.py`` (Silero VAD ONNX: stateful LSTM
with h/c ``[2, 1, 64]`` state, ``trim()`` silence trimming, ``__call__`` ->
speech probability). Two implementations:

* :class:`SileroStyleVAD` — the Silero architecture in JAX (STFT features ->
  conv encoder -> 2-layer LSTM -> sigmoid head) with ``import_weights`` for a
  converted checkpoint (npz). Random weights are NOT useful for detection.
* :class:`EnergyVAD` — a dependency-free adaptive-energy detector used as the
  default when no weights are present (and for TTS output trimming, where the
  reference uses VAD only to strip synthesis silence, vad.py:25-83).

``get_vad_model()`` returns the Silero-style model when weights are available,
else the energy model — both share the same call/trim interface.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from heybuddy_tpu.constants import SAMPLE_RATE

__all__ = ["EnergyVAD", "SileroStyleVAD", "SileroOnnxVAD", "get_vad_model"]


class _TrimMixin:
    """Shared silence-trimming logic (reference vad.py:25-83)."""

    def trim(
        self,
        audio: np.ndarray,
        sample_rate: int = SAMPLE_RATE,
        frame_duration: float = 0.03,
        min_start: int = 2000,
        threshold: float = 0.15,
        pad_s: Optional[Union[float, Tuple[float, float]]] = None,
    ) -> np.ndarray:
        return_first = False
        if audio.ndim == 1:
            return_first = True
            audio = audio[np.newaxis, :]

        audio_len = audio.shape[1]
        frame_size = int(sample_rate * frame_duration)

        start = min_start
        for i in range(min_start, audio_len, frame_size):
            if self(audio[:, i : i + frame_size], sample_rate) > threshold:
                start = i
                break

        end = audio_len
        for i in range(audio_len - frame_size, min_start, -frame_size):
            if self(audio[:, i : i + frame_size], sample_rate) > threshold:
                end = min(i + frame_size, audio_len)
                break

        audio = np.hstack([audio[:, :min_start], audio[:, start:end]])

        if isinstance(pad_s, tuple):
            pad_start, pad_end = pad_s
        elif isinstance(pad_s, float):
            pad_start = pad_end = pad_s
        else:
            pad_start = pad_end = 0.0
        if pad_start > 0 or pad_end > 0:
            audio = np.pad(
                audio,
                ((0, 0), (int(pad_start * sample_rate), int(pad_end * sample_rate))),
            )

        if return_first:
            return audio[0]
        return audio


class EnergyVAD(_TrimMixin):
    """
    Adaptive-energy speech detector: frame RMS relative to a running noise
    floor, mapped through a soft threshold to a [0, 1] pseudo-probability.
    Stateless per call aside from the noise-floor estimate.
    """

    def __init__(self, floor_decay: float = 0.98) -> None:
        self.floor_decay = floor_decay
        self._noise_floor = 1e-4

    def reset(self) -> None:
        self._noise_floor = 1e-4

    def __call__(self, audio: np.ndarray, sample_rate: int = SAMPLE_RATE, **_: Any) -> float:
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=0)
        if audio.size == 0:
            return 0.0
        rms = float(np.sqrt(np.mean(audio**2)))
        self._noise_floor = min(
            self.floor_decay * self._noise_floor + (1 - self.floor_decay) * rms,
            max(rms, 1e-5),
        )
        ratio = rms / (self._noise_floor + 1e-6)
        # ratio 1 -> ~0, ratio >= 8 -> ~1
        return float(np.clip((ratio - 1.5) / 6.5, 0.0, 1.0))


class VADGate:
    """
    Speaking-state hysteresis over any frame-probability VAD (the reference
    runtime's state machine, browser vad.ts:108-141 semantics): speech STARTS
    when a frame probability reaches ``positive_threshold`` and ENDS only
    after ``silent_frames_to_stop`` CONSECUTIVE frames below
    ``negative_threshold`` — brief intra-phrase dips do not release the gate.

    Defaults match the reference's Silero operating point (0.65 / 0.4 / 8
    frames of 20 ms = 160 ms hold); pass ``positive_threshold=0.5,
    negative_threshold=0.25`` for the energy VAD's calibration (its pseudo-
    probability is flatter than Silero's — see tests/test_vad_gate.py for the
    speech-corpus validation of both operating points).
    """

    def __init__(
        self,
        vad: Any = None,
        positive_threshold: float = 0.65,
        negative_threshold: float = 0.4,
        silent_frames_to_stop: int = 8,
    ) -> None:
        self.vad = vad
        self.positive_threshold = positive_threshold
        self.negative_threshold = negative_threshold
        self.silent_frames_to_stop = silent_frames_to_stop
        self.speaking = False
        self.silent_frames = 0

    def reset(self) -> None:
        self.speaking = False
        self.silent_frames = 0
        if self.vad is not None and hasattr(self.vad, "reset"):
            self.vad.reset()

    def update(self, frame_or_probability: Any) -> bool:
        """Advance one frame (raw audio if a VAD is attached, else a float)."""
        if self.vad is not None and not np.isscalar(frame_or_probability):
            p = float(self.vad(np.asarray(frame_or_probability)))
        else:
            p = float(frame_or_probability)
        if not self.speaking:
            if p >= self.positive_threshold:
                self.speaking = True
                self.silent_frames = 0
        elif p < self.negative_threshold:
            self.silent_frames += 1
            if self.silent_frames >= self.silent_frames_to_stop:
                self.speaking = False
                self.silent_frames = 0
        else:
            self.silent_frames = 0
        return self.speaking


class SileroStyleVAD(_TrimMixin):
    """
    Silero-architecture VAD in JAX: per-chunk STFT magnitude features ->
    1D conv encoder -> 2-layer LSTM (h/c state ``[2, 1, 64]``) -> probability.
    State persists across calls like the reference's ONNX session
    (vad.py:22-23), reset with :meth:`reset`.
    """

    HIDDEN = 64

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0) -> None:
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.h = np.zeros((2, 1, self.HIDDEN), dtype=np.float32)
        self.c = np.zeros((2, 1, self.HIDDEN), dtype=np.float32)
        if weights_path and os.path.exists(weights_path):
            loaded = np.load(weights_path)
            self.params = {k: jnp.asarray(loaded[k]) for k in loaded.files}
        else:
            self.params = self._init_params(seed)
        self._step = jax.jit(self._forward)

    def _init_params(self, seed: int) -> Dict[str, Any]:
        jnp = self._jnp
        rng = np.random.default_rng(seed)

        def dense(i: int, o: int) -> np.ndarray:
            return (rng.standard_normal((i, o)) / np.sqrt(i)).astype(np.float32)

        feat = 64
        return {
            "enc_w": jnp.asarray(dense(129, feat)),
            "enc_b": jnp.asarray(np.zeros(feat, np.float32)),
            "lstm0_wi": jnp.asarray(dense(feat, 4 * self.HIDDEN)),
            "lstm0_wh": jnp.asarray(dense(self.HIDDEN, 4 * self.HIDDEN)),
            "lstm0_b": jnp.asarray(np.zeros(4 * self.HIDDEN, np.float32)),
            "lstm1_wi": jnp.asarray(dense(self.HIDDEN, 4 * self.HIDDEN)),
            "lstm1_wh": jnp.asarray(dense(self.HIDDEN, 4 * self.HIDDEN)),
            "lstm1_b": jnp.asarray(np.zeros(4 * self.HIDDEN, np.float32)),
            "out_w": jnp.asarray(dense(self.HIDDEN, 1)),
            "out_b": jnp.asarray(np.zeros(1, np.float32)),
        }

    def _forward(self, params: Dict[str, Any], audio: Any, h: Any, c: Any):
        jnp = self._jnp
        jax = self._jax
        # 256-point STFT magnitude, mean over ALL frames -> (129,). Framing
        # the whole chunk matters: scoring only the first 256 samples made
        # speech in the later half of a 320/480-sample frame look like
        # silence, landing trim boundaries a frame late.
        b = audio.shape[0]
        n = audio.shape[-1]
        n_frames = max(-(-n // 256), 1)
        pad = n_frames * 256 - n
        padded = jnp.pad(audio, ((0, 0), (0, pad)))
        frames = padded.reshape(b, n_frames, 256) * jnp.hanning(256)
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)).mean(axis=1)  # (b, 129)
        feats = jnp.log1p(spec) @ params["enc_w"] + params["enc_b"]
        feats = jax.nn.relu(feats)

        def lstm_cell(wi, wh, b, x, h_prev, c_prev):
            gates = x @ wi + h_prev @ wh + b
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return h_new, c_new

        h0, c0 = lstm_cell(
            params["lstm0_wi"], params["lstm0_wh"], params["lstm0_b"], feats, h[0], c[0]
        )
        h1, c1 = lstm_cell(
            params["lstm1_wi"], params["lstm1_wh"], params["lstm1_b"], h0, h[1], c[1]
        )
        prob = jax.nn.sigmoid(h1 @ params["out_w"] + params["out_b"])
        new_h = jnp.stack([h0, h1])
        new_c = jnp.stack([c0, c1])
        return prob[0, 0], new_h, new_c

    def reset(self) -> None:
        self.h = np.zeros((2, 1, self.HIDDEN), dtype=np.float32)
        self.c = np.zeros((2, 1, self.HIDDEN), dtype=np.float32)

    def __call__(self, audio: np.ndarray, sample_rate: int = SAMPLE_RATE, **_: Any) -> float:
        jnp = self._jnp
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[np.newaxis, :]
        mono = audio.mean(axis=0)
        # Pad to a 256-sample multiple so arbitrary chunk lengths (trim's
        # variable trailing frame) reuse a handful of compiled shapes instead
        # of one remote compile per distinct length.
        target = max(256, -(-mono.shape[-1] // 256) * 256)
        if mono.shape[-1] < target:
            mono = np.pad(mono, (0, target - mono.shape[-1]))
        prob, h, c = self._step(self.params, jnp.asarray(mono[None]),
                                jnp.asarray(self.h), jnp.asarray(self.c))
        self.h = np.asarray(h)
        self.c = np.asarray(c)
        return float(prob)


class SileroOnnxVAD(_TrimMixin):
    """
    The actual Silero VAD imported from its ONNX artifact (reference
    vad.py:9-23, hosted ``silero-vad.onnx`` at vad.py:13) via the in-repo
    ONNX->JAX converter — the real frozen weights, jitted for the device.

    Handles both published layouts: v3/v4 (inputs ``input, sr, h, c``;
    outputs ``output, hn, cn``) and v5 (inputs ``input, state, sr``; output
    ``output, stateN``). The sample rate folds statically at trace time so
    the graph's ``If`` sample-rate branch disappears from the compiled
    program. Recurrent state persists across calls like the reference's ONNX
    session (vad.py:22-23); reset with :meth:`reset`.
    """

    def __init__(self, onnx_path: str, sample_rate: int = SAMPLE_RATE) -> None:
        import jax

        from heybuddy_tpu.export.onnx_to_jax import OnnxJaxFunction

        self._fn = OnnxJaxFunction.from_file(onnx_path)
        self.params = self._fn.params
        self.sample_rate = sample_rate
        names = self._fn.input_names
        self._v5 = "state" in names
        self._state_shape = (2, 1, 128) if self._v5 else (2, 1, 64)
        expected = {"input", "sr", "state"} if self._v5 else {"input", "sr", "h", "c"}
        unknown = set(names) - expected
        if unknown:
            raise ValueError(f"Unrecognized Silero VAD graph inputs: {sorted(unknown)}")
        self.reset()

        def step(params: Any, audio: Any, *state: Any) -> Any:
            # sr is a static numpy scalar -> the If branch folds at trace time
            ordered = []
            state_iter = iter(state)
            for name in names:
                if name == "input":
                    ordered.append(audio)
                elif name == "sr":
                    ordered.append(np.int64(self.sample_rate))
                else:
                    ordered.append(next(state_iter))
            return self._fn(params, *ordered)

        self._step = jax.jit(step)

    def reset(self) -> None:
        if self._v5:
            self._state: tuple = (np.zeros(self._state_shape, np.float32),)
        else:
            self._state = (
                np.zeros(self._state_shape, np.float32),
                np.zeros(self._state_shape, np.float32),
            )

    def __call__(self, audio: np.ndarray, sample_rate: int = SAMPLE_RATE, **_: Any) -> float:
        if sample_rate != self.sample_rate:
            # The sr input folds statically at trace time; silently scoring
            # 8 kHz audio with a 16 kHz graph would give wrong probabilities.
            raise ValueError(
                f"SileroOnnxVAD was built for {self.sample_rate} Hz; got "
                f"{sample_rate} Hz (construct a new instance for that rate)"
            )
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=0)
        # Silero expects fixed chunks (512 samples at 16 kHz for v5; v4 accepts
        # flexible lengths) — zero-pad up to whole chunks (truncating dropped
        # up to 511 trailing samples, losing speech near the boundary).
        chunk = 512 if self.sample_rate == 16000 else 256
        pad = (-audio.shape[-1]) % chunk
        if pad or audio.shape[-1] == 0:
            audio = np.pad(audio, (0, pad if audio.shape[-1] else chunk))
        probs = []
        for i in range(0, audio.shape[-1], chunk):
            out = self._step(self.params, audio[None, i : i + chunk], *self._state)
            if not isinstance(out, (list, tuple)):
                out = [out]
            prob, new_state = out[0], out[1:]
            self._state = tuple(np.asarray(s) for s in new_state)
            probs.append(float(np.asarray(prob).reshape(-1)[0]))
        return max(probs) if probs else 0.0


_GLOBAL_VAD: Optional[_TrimMixin] = None


def get_vad_model(**_compat: Any) -> _TrimMixin:
    """
    Shared VAD instance (reference vad.py:114-120). Resolution order:
    ``HEYBUDDY_VAD_ONNX`` (the reference's silero-vad.onnx, imported exactly)
    > ``HEYBUDDY_VAD_WEIGHTS`` (converted npz for SileroStyleVAD) > energy
    heuristic.
    """
    global _GLOBAL_VAD
    if _GLOBAL_VAD is None:
        onnx_path = os.environ.get("HEYBUDDY_VAD_ONNX")
        weights = os.environ.get("HEYBUDDY_VAD_WEIGHTS")
        if onnx_path and os.path.exists(onnx_path):
            _GLOBAL_VAD = SileroOnnxVAD(onnx_path)
        elif weights and os.path.exists(weights):
            _GLOBAL_VAD = SileroStyleVAD(weights)
        else:
            _GLOBAL_VAD = EnergyVAD()
    return _GLOBAL_VAD
