"""
TTS engine: batched speech synthesis for training-sample generation.

Call-contract parity with reference ``piper/pretrained.py`` (PiperTTSModel):
``tts(texts, num_samples, ...) -> List[(text, int16 16 kHz audio)]`` with
weighted text sampling, a cycling settings grid (slerp weights x length scales
x noise scales x noise-scale-ws), cycling speaker pairs with spherical
interpolation between speaker embeddings, peak-normalized int16 output, and
optional VAD silence trimming.

Two backends behind the same interface:

* :class:`VitsTTS` — the JAX VITS synthesizer. Weights come from
  ``HEYBUDDY_TTS_CHECKPOINT`` (piper .safetensors / torch .pt; the optional
  voice-config JSON at ``HEYBUDDY_TTS_CONFIG`` supplies the exact espeak
  phoneme-id map). Texts are phonemized by the rule G2P and mapped
  ARPAbet -> IPA -> ids.
* :class:`FormantTTS` — the dependency-free formant synthesizer
  (models/formant.py), the default when no checkpoint is present.
* :class:`DeviceFormantTTS` — the same synthesis planned on the host but
  rendered on the TPU (models/formant_device.py); opt-in via the
  "formant-device" backend name.

``get_tts_model()`` picks the backend automatically.
"""

from __future__ import annotations

import functools
import itertools
import json
import os
import random
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from heybuddy_tpu.constants import (
    DEFAULT_TTS_LENGTH_SCALES,
    DEFAULT_TTS_NOISE_SCALE_WEIGHTS,
    DEFAULT_TTS_NOISE_SCALES,
    DEFAULT_TTS_SLERP_WEIGHTS,
    SAMPLE_RATE,
)
from heybuddy_tpu.text.phonemizer import get_phonemizer
from heybuddy_tpu.utils.audio_io import resample_audio
from heybuddy_tpu.utils.log import logger

__all__ = [
    "BaseTTS",
    "FormantTTS",
    "DeviceFormantTTS",
    "VitsTTS",
    "get_tts_model",
    "arpabet_to_ipa",
]

TextsType = Union[str, List[str], List[Tuple[str, float]]]

# Version of the sampling contract feeding feature caches (speaker/settings
# grid traversal). Bumped in round 3 when chunked generation gained grid
# offsets: before that, every chunk re-rendered speaker 0 at the grid's first
# settings tuple, so caches produced under v1 are not reproducible under v2.
SAMPLING_VERSION = 2

# ARPAbet -> espeak-style IPA used by piper voices.
_ARPA_TO_IPA: Dict[str, str] = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "EH": "ɛ", "ER": "ɚ", "EY": "eɪ", "IH": "ɪ", "IY": "i", "OW": "oʊ",
    "OY": "ɔɪ", "UH": "ʊ", "UW": "u",
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "F": "f", "G": "ɡ",
    "HH": "h", "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n",
    "NG": "ŋ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ", "T": "t",
    "TH": "θ", "V": "v", "W": "w", "Y": "j", "Z": "z", "ZH": "ʒ",
}


def arpabet_to_ipa(phones: List[List[str]]) -> str:
    """Word-phone lists -> IPA string with spaces between words."""
    words = ["".join(_ARPA_TO_IPA.get(p, "") for p in word) for word in phones]
    return " ".join(w for w in words if w)


class BaseTTS:
    """Shared sampling/grid/trim logic; subclasses implement ``synthesize_batch``."""

    sample_rate = SAMPLE_RATE

    def __init__(self) -> None:
        # the selected backend (simple rule engine by default; espeak or the
        # neural model via HEYBUDDY_PHONEMIZER) — the backend changes the
        # rendered audio, so it is part of the cache provenance tag
        # (data/space.py tts_provenance)
        self.phonemizer = get_phonemizer()

    # subclass hook -------------------------------------------------------------
    def synthesize_batch(
        self,
        texts: List[str],
        speakers: List[Tuple[int, int]],
        slerp_weight: float,
        length_scale: float,
        noise_scale: float,
        noise_scale_w: float,
        seed: int,
    ) -> List[np.ndarray]:
        raise NotImplementedError

    @property
    def num_speakers(self) -> int:
        raise NotImplementedError

    def plan_batch(
        self,
        texts: List[str],
        speakers: List[Tuple[int, int]],
        slerp_weight: float,
        length_scale: float,
        noise_scale: float,
        noise_scale_w: float,
        seed: int,
    ) -> List[Any]:
        """Device ClipPlans for the fused pipeline (backends that support it)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support the fused plan pipeline")

    @property
    def supports_plans(self) -> bool:
        return type(self).plan_batch is not BaseTTS.plan_batch

    # ---------------------------------------------------------------------------

    def trim_silence(self, sample: np.ndarray, threshold: float = 0.05) -> np.ndarray:
        from heybuddy_tpu.models.vad import get_vad_model

        return get_vad_model().trim(sample, threshold=threshold)

    def __call__(
        self,
        texts: TextsType,
        num_samples: Optional[int] = None,
        batch_size: int = 1,
        slerp_weights: Sequence[float] = DEFAULT_TTS_SLERP_WEIGHTS,
        length_scales: Sequence[float] = DEFAULT_TTS_LENGTH_SCALES,
        noise_scales: Sequence[float] = DEFAULT_TTS_NOISE_SCALES,
        noise_scale_ws: Sequence[float] = DEFAULT_TTS_NOISE_SCALE_WEIGHTS,
        max_speakers: Optional[int] = None,
        min_phoneme_count: Optional[int] = None,
        target_sample_rate: Optional[int] = None,
        trim_silence: bool = False,
        seed: Optional[int] = None,
        on_progress: Optional[Callable[[int, int], None]] = None,
        settings_offset: int = 0,
        speakers_offset: int = 0,
        as_plans: bool = False,
    ) -> List[Tuple[str, Any]]:
        """Generate speech samples (reference pretrained.py:283-425 contract).

        ``as_plans=True`` (backends implementing ``plan_batch``) returns
        device ClipPlans — or host float32 audio for clips the device cannot
        express — instead of int16 PCM; requires the native sample rate and
        no silence trimming.

        The speaker/settings grids restart at the given offsets on EVERY call
        (offset 0 by default): a one-batch call with default offsets always
        renders speaker pair (0, 0) at the first settings tuple. Callers that
        chunk one logical generation into several calls MUST advance
        ``settings_offset`` (one per batch) and ``speakers_offset`` (one per
        clip) across calls, or every chunk re-renders the grid's first row —
        the speaker-collapse bug that silently flattened all pre-r3 feature
        caches to speaker 0 (and embeddings v1-v5 before it, see
        ``SpeechSampleGenerator.__call__``).
        """
        if not isinstance(texts, list):
            texts = [texts]
        weighted: List[Tuple[str, float]] = [
            t if isinstance(t, tuple) else (t, 1.0) for t in texts
        ]
        if num_samples is None:
            num_samples = len(weighted)
        target_sample_rate = target_sample_rate or self.sample_rate
        if as_plans and (trim_silence or target_sample_rate != self.sample_rate):
            raise ValueError(
                "as_plans requires the native sample rate and trim_silence=False")

        n_speakers = self.num_speakers
        if max_speakers is not None:
            n_speakers = min(n_speakers, max_speakers)

        # Grids as index math (reference pretrained.py's cycling iterators,
        # but stateless): position p of the speaker grid is the pair
        # (p // n, p % n); settings tuple b of the product grid likewise.
        settings_grid = list(
            itertools.product(slerp_weights, length_scales, noise_scales, noise_scale_ws)
        )
        rng = random.Random(seed)

        batch_size = max(batch_size, 1)
        num_batches = (num_samples + batch_size - 1) // batch_size
        samples: List[Tuple[str, np.ndarray]] = []
        phrases = [t for t, _ in weighted]
        probabilities = [p for _, p in weighted]

        for i in range(num_batches):
            this_batch = max(min(batch_size, num_samples - i * batch_size), 1)
            base = speakers_offset + i * batch_size
            speakers = [
                (((base + j) // n_speakers) % n_speakers, (base + j) % n_speakers)
                for j in range(this_batch)
            ]
            slerp_weight, length_scale, noise_scale, noise_scale_w = settings_grid[
                (settings_offset + i) % len(settings_grid)
            ]
            batch_texts = rng.choices(phrases, weights=probabilities, k=this_batch)

            if as_plans:
                # Fused-pipeline mode: ClipPlans (or host-rendered float32
                # audio for inexpressible clips) without the int16
                # postprocessing below — the device consumes plans directly.
                for text, item in zip(batch_texts, self.plan_batch(
                    batch_texts, speakers, slerp_weight, length_scale,
                    noise_scale, noise_scale_w, seed=(seed or 0) * 100003 + i,
                )):
                    samples.append((text, item))
                    if on_progress is not None:
                        on_progress(len(samples), num_samples)
                continue

            audio_batch = self.synthesize_batch(
                batch_texts,
                speakers,
                slerp_weight,
                length_scale,
                noise_scale,
                noise_scale_w,
                seed=(seed or 0) * 100003 + i,
            )

            for text, clip in zip(batch_texts, audio_batch):
                if self.sample_rate != target_sample_rate:
                    clip = resample_audio(clip, self.sample_rate, target_sample_rate)
                # peak-normalize into int16 (reference pretrained.py:405-408)
                peak = max(0.01, float(np.abs(clip).max()))
                pcm = np.clip(clip * (32767.0 / peak), -32768, 32767).astype(np.int16)
                pcm = np.trim_zeros(pcm)
                if trim_silence:
                    pcm = self.trim_silence(pcm.astype(np.float32) / 32768.0)
                    pcm = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
                samples.append((text, pcm))
                if on_progress is not None:
                    on_progress(len(samples), num_samples)

        if on_progress is not None:
            on_progress(num_samples, num_samples)
        return samples


def _blend_speaker_params(synth: Any, s1: int, s2: int, w: float) -> Tuple[float, float]:
    """Interpolate two formant speakers' (f0 base, vocal-tract scale)."""
    fa, sa = synth._speaker(s1)
    fb, sb = synth._speaker(s2)
    return (fa * (1.0 - w) + fb * w, sa * (1.0 - w) + sb * w)


class FormantTTS(BaseTTS):
    """Offline formant-synthesis backend (default without a checkpoint)."""

    def __init__(self, num_speakers: int = 904) -> None:
        super().__init__()
        from heybuddy_tpu.models.formant import FormantSynthesizer

        self.synth = FormantSynthesizer()
        self._num_speakers = num_speakers
        self._pool = None

    @property
    def num_speakers(self) -> int:
        return self._num_speakers

    def _executor(self, workers: int):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix="heybuddy-tts"
            )
        return self._pool

    def synthesize_batch(
        self,
        texts: List[str],
        speakers: List[Tuple[int, int]],
        slerp_weight: float,
        length_scale: float,
        noise_scale: float,
        noise_scale_w: float,
        seed: int,
    ) -> List[np.ndarray]:
        # True speaker interpolation (the formant analogue of the reference's
        # VITS embedding slerp, pretrained.py:359-368): blend the two
        # speakers' (f0, vocal-tract scale) by the slerp weight, so the s2
        # grid axis varies the voice even at intermediate weights. The old
        # nearest-speaker pick collapsed to s1=0 whenever slerp < 0.5.
        tasks = [
            (
                text,
                s1 * 104729 + s2,
                _blend_speaker_params(self.synth, s1, s2, slerp_weight),
                seed * 31 + j,
            )
            for j, (text, (s1, s2)) in enumerate(zip(texts, speakers))
        ]

        def render(task: Tuple[str, int, Tuple[float, float], int]) -> np.ndarray:
            text, speaker, params, clip_seed = task
            return self.synth.synthesize(
                text,
                speaker=speaker,
                length_scale=length_scale,
                noise_scale=noise_scale,
                seed=clip_seed,
                speaker_params=params,
            )

        # Host TTS is the end-to-end pipeline's bottleneck (END_TO_END.md) and
        # each clip is rendered from its own explicit seed, so fan out across
        # host cores when there are any. Outputs are deterministic and
        # identical to the serial path regardless of thread count (collected
        # in submission order; the synthesizer is stateless per call and
        # numpy-only, which also keeps the axon single-chip rule — device
        # work stays on the main thread). HEYBUDDY_TTS_THREADS overrides; 1
        # forces serial.
        env = os.environ.get("HEYBUDDY_TTS_THREADS", "").strip()
        workers = int(env) if env else min(os.cpu_count() or 1, 8)
        if workers > 1 and len(tasks) > 1:
            return list(self._executor(workers).map(render, tasks))
        return [render(t) for t in tasks]


class DeviceFormantTTS(BaseTTS):
    """TPU-rendered formant backend ("formant-device").

    Same utterance planning as :class:`FormantTTS` (segments, formant tracks,
    pitch and phase are computed by the same host code), but the rendering
    FLOPs run on the device (`models/formant_device.py`) — the host pipeline's
    measured bottleneck (END_TO_END.md). Planning is numpy-only; the device
    call happens on the caller's thread, keeping the axon single-thread rule.
    Clips longer than the compiled shape fall back to the host renderer.
    """

    def __init__(self, num_speakers: int = 904, max_samples: Optional[int] = None,
                 harmonics: Optional[int] = None) -> None:
        super().__init__()
        from heybuddy_tpu.models.formant import FormantSynthesizer
        from heybuddy_tpu.models.formant_device import (
            DEFAULT_HARMONICS,
            DEFAULT_MAX_SAMPLES,
            DeviceFormantPlanner,
        )

        self.planner = DeviceFormantPlanner(
            max_samples=max_samples or DEFAULT_MAX_SAMPLES)
        self.harmonics = harmonics or DEFAULT_HARMONICS
        self._host = FormantSynthesizer()
        self._num_speakers = num_speakers

    @property
    def num_speakers(self) -> int:
        return self._num_speakers

    @staticmethod
    def _bucket(n: int) -> int:
        """Pad batches to a few fixed sizes: each new batch shape is a fresh
        remote compile (40-500 s) on the tunneled TPU."""
        for b in (8, 32, 128, 256):
            if n <= b:
                return b
        return n

    def synthesize_batch(
        self,
        texts: List[str],
        speakers: List[Tuple[int, int]],
        slerp_weight: float,
        length_scale: float,
        noise_scale: float,
        noise_scale_w: float,
        seed: int,
    ) -> List[np.ndarray]:
        from heybuddy_tpu.models.formant_device import render_batch

        items = self.plan_batch(
            texts, speakers, slerp_weight, length_scale, noise_scale,
            noise_scale_w, seed)
        device_idx = [i for i, p in enumerate(items) if not isinstance(p, np.ndarray)]
        rendered = render_batch(
            [items[i] for i in device_idx],
            l_max=self.planner.max_samples,
            harmonics=self.harmonics,
            pad_to=self._bucket(len(device_idx)),
        )
        out: List[Any] = list(items)
        for i, clip in zip(device_idx, rendered):
            out[i] = clip
        return out

    def plan_batch(
        self,
        texts: List[str],
        speakers: List[Tuple[int, int]],
        slerp_weight: float,
        length_scale: float,
        noise_scale: float,
        noise_scale_w: float,
        seed: int,
    ) -> List[Any]:
        """Per-clip ClipPlans for the fused device pipeline; clips the device
        renderer cannot express (too long / too many noise segments) come back
        as host-rendered float32 AUDIO arrays instead — consumers dispatch on
        the type."""
        tasks = [
            (
                text,
                s1 * 104729 + s2,
                _blend_speaker_params(self._host, s1, s2, slerp_weight),
                seed * 31 + j,
            )
            for j, (text, (s1, s2)) in enumerate(zip(texts, speakers))
        ]
        items: List[Any] = []
        for text, speaker, params, clip_seed in tasks:
            plan = self.planner.plan(
                text, speaker=speaker, length_scale=length_scale,
                noise_scale=noise_scale, seed=clip_seed,
                speaker_params=params)
            if plan is None:
                items.append(self._host.synthesize(
                    text, speaker=speaker, length_scale=length_scale,
                    noise_scale=noise_scale, seed=clip_seed,
                    speaker_params=params))
            else:
                items.append(plan)
        return items


class VitsTTS(BaseTTS):
    """JAX VITS backend (piper checkpoint import)."""

    model_sample_rate = 22050

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        config_path: Optional[str] = None,
    ) -> None:
        super().__init__()
        import jax

        from heybuddy_tpu.models.vits import VitsConfig, import_torch_checkpoint, infer, init_params

        self._jax = jax
        self._infer = infer
        self.config = VitsConfig()
        self.sample_rate = self.model_sample_rate

        checkpoint_path = checkpoint_path or os.environ.get("HEYBUDDY_TTS_CHECKPOINT")
        config_path = config_path or os.environ.get("HEYBUDDY_TTS_CONFIG")

        # Default to the piper-phonemize table so bare checkpoints (no voice
        # config JSON) phonemize with the ids every real piper voice expects
        # (text/piper_maps.py); a voice's own config still takes precedence.
        from heybuddy_tpu.text.piper_maps import piper_phoneme_id_map, piper_speaker_id_map

        self.phoneme_id_map: Dict[str, List[int]] = dict(piper_phoneme_id_map())
        self.speaker_id_map: Dict[str, int] = dict(piper_speaker_id_map())
        if config_path and os.path.exists(config_path):
            with open(config_path) as f:
                voice_config = json.load(f)
            if "phoneme_id_map" in voice_config:
                self.phoneme_id_map = voice_config["phoneme_id_map"]
            if "speaker_id_map" in voice_config:
                self.speaker_id_map = voice_config["speaker_id_map"]
            audio_cfg = voice_config.get("audio", {})
            self.sample_rate = audio_cfg.get("sample_rate", self.model_sample_rate)

        if checkpoint_path and os.path.exists(checkpoint_path):
            self.params = import_torch_checkpoint(checkpoint_path, self.config)
            logger.info(f"Loaded VITS checkpoint from {checkpoint_path}")
        else:
            logger.warning(
                "No VITS checkpoint found; using random weights (noise audio). "
                "Set HEYBUDDY_TTS_CHECKPOINT, or use the formant backend."
            )
            self.params = init_params(jax.random.PRNGKey(0), self.config)

    @property
    def num_speakers(self) -> int:
        return self.config.n_speakers

    def resolve_speaker(self, speaker: Any) -> int:
        """Speaker NAME (e.g. LibriTTS "3922") or integer id -> integer id."""
        if isinstance(speaker, str) and not speaker.isdigit():
            raise KeyError(f"Unknown speaker name {speaker!r}")
        if isinstance(speaker, str):
            if speaker in self.speaker_id_map:
                return int(self.speaker_id_map[speaker])
            return int(speaker)
        return int(speaker)

    def phonemize_ids(self, text: str, min_phoneme_count: Optional[int] = None) -> List[int]:
        """Text -> interspersed phoneme ids with BOS/EOS (piper convention)."""
        phones = [self.phonemizer.word_phones(w) for w in text.split()]
        ipa = arpabet_to_ipa(phones)
        ids: List[int] = list(self.phoneme_id_map.get("^", [1]))
        pad = self.phoneme_id_map.get("_", [0])
        for char in ipa:
            if char in self.phoneme_id_map:
                ids.extend(self.phoneme_id_map[char])
                ids.extend(pad)
        ids.extend(self.phoneme_id_map.get("$", [2]))
        return ids

    def _slerp(self, a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
        a_norm = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
        b_norm = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-9)
        dot = np.clip((a_norm * b_norm).sum(-1), -1.0, 1.0)
        if (np.abs(dot) > 0.9995).any():
            return (1 - t) * a + t * b
        theta = np.arccos(dot)
        s1 = np.sin(theta - theta * t) / np.sin(theta)
        s2 = np.sin(theta * t) / np.sin(theta)
        return s1[..., None] * a + s2[..., None] * b

    @functools.lru_cache(maxsize=8)
    def _jitted_infer(self, t_x: int, max_frames: int):
        import functools as ft

        return self._jax.jit(
            ft.partial(self._infer, max_frames=max_frames, config=self.config)
        )

    def synthesize_batch(
        self,
        texts: List[str],
        speakers: List[Tuple[int, int]],
        slerp_weight: float,
        length_scale: float,
        noise_scale: float,
        noise_scale_w: float,
        seed: int,
    ) -> List[np.ndarray]:
        import jax.numpy as jnp

        id_lists = [self.phonemize_ids(t) for t in texts]
        lengths = np.array([len(ids) for ids in id_lists], dtype=np.int32)
        # Bucket text length to multiples of 16 to bound recompiles.
        t_x = int(np.ceil(max(lengths) / 16) * 16)
        ids = np.zeros((len(texts), t_x), dtype=np.int32)
        for i, lst in enumerate(id_lists):
            ids[i, : len(lst)] = lst

        emb = np.asarray(self.params["emb_g"])
        s1 = emb[[s[0] for s in speakers]]
        s2 = emb[[s[1] for s in speakers]]
        speaker_embedding = self._slerp(s1, s2, slerp_weight).astype(np.float32)

        # frame budget: ~1 frame per phoneme id at length_scale 1, padded
        max_frames = int(np.ceil(t_x * 2 * max(length_scale, 1.0) / 64) * 64)
        fn = self._jitted_infer(t_x, max_frames)
        audio, audio_lengths = fn(
            self.params,
            self._jax.random.PRNGKey(seed),
            jnp.asarray(ids),
            jnp.asarray(lengths),
            jnp.asarray(speaker_embedding),
            noise_scale=noise_scale,
            length_scale=length_scale,
            noise_scale_w=noise_scale_w,
        )
        audio = np.asarray(audio)
        out = []
        for i, n in enumerate(np.asarray(audio_lengths)):
            out.append(audio[i, : int(n)])
        return out


_GLOBAL_TTS: Dict[str, BaseTTS] = {}


def get_tts_model(backend: Optional[str] = None, **kwargs: Any) -> BaseTTS:
    """
    Shared TTS instance per backend (reference pretrained.py:427-443).
    Backend resolution: explicit arg > HEYBUDDY_TTS_BACKEND env > "vits" if a
    checkpoint exists > "formant". Instances are cached by resolved backend
    name so mixed-backend processes (benchmarks, backend comparisons) get the
    backend they ask for rather than whichever was constructed first.
    """
    backend = backend or os.environ.get("HEYBUDDY_TTS_BACKEND")
    if backend is None:
        ckpt = os.environ.get("HEYBUDDY_TTS_CHECKPOINT")
        backend = "vits" if (ckpt and os.path.exists(ckpt)) else "formant"
    if backend == "device":
        backend = "formant-device"
    if backend not in _GLOBAL_TTS:
        if backend == "vits":
            _GLOBAL_TTS[backend] = VitsTTS(**kwargs)
        elif backend == "formant-device":
            _GLOBAL_TTS[backend] = DeviceFormantTTS(**kwargs)
        else:
            _GLOBAL_TTS[backend] = FormantTTS(**kwargs)
    return _GLOBAL_TTS[backend]
