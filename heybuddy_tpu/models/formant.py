"""
Offline formant speech synthesizer (deterministic fallback TTS).

The reference depends on a hosted pretrained Piper/VITS checkpoint
(piper/pretrained.py:36). When no checkpoint is available (air-gapped
deployments, CI), this module synthesizes intelligible-enough, word-dependent
audio from the rule G2P's ARPAbet phonemes using classic source-filter
synthesis: a glottal harmonic source shaped by per-phoneme formant envelopes,
plus shaped noise for fricatives and gap+burst dynamics for stops.

It is NOT a neural TTS — its purpose is to make the full training pipeline
(synthesize -> augment -> featurize -> train) runnable and *meaningful*
end-to-end with zero downloaded assets: different phrases produce consistently
different audio, with speaker/rate/pitch diversity knobs mirroring the VITS
settings grid (slerp weights x length scales x noise scales).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from heybuddy_tpu.constants import SAMPLE_RATE
from heybuddy_tpu.text.phonemizer import SimplePhonemizer

__all__ = ["FormantSynthesizer"]

# (F1, F2, F3) vowel targets in Hz; diphthongs carry two targets.
_VOWELS: Dict[str, Tuple[Tuple[float, float, float], ...]] = {
    "AA": ((730, 1090, 2440),),
    "AE": ((660, 1720, 2410),),
    "AH": ((640, 1190, 2390),),
    "AO": ((570, 840, 2410),),
    "EH": ((530, 1840, 2480),),
    "ER": ((490, 1350, 1690),),
    "IH": ((390, 1990, 2550),),
    "IY": ((270, 2290, 3010),),
    "UH": ((440, 1020, 2240),),
    "UW": ((300, 870, 2240),),
    "OW": ((570, 840, 2410), (300, 870, 2240)),
    "AY": ((730, 1090, 2440), (270, 2290, 3010)),
    "EY": ((530, 1840, 2480), (270, 2290, 3010)),
    "OY": ((570, 840, 2410), (270, 2290, 3010)),
    "AW": ((730, 1090, 2440), (300, 870, 2240)),
}

# Noise band (low, high) Hz and relative level for fricatives.
_FRICATIVES: Dict[str, Tuple[float, float, float]] = {
    "S": (4000, 8000, 0.6),
    "SH": (2000, 6000, 0.6),
    "F": (1500, 7000, 0.35),
    "TH": (1400, 7000, 0.3),
    "Z": (4000, 8000, 0.5),
    "ZH": (2000, 6000, 0.5),
    "V": (1000, 5000, 0.35),
    "DH": (1000, 5000, 0.3),
    "HH": (500, 4000, 0.3),
}

_STOPS: Dict[str, Tuple[float, float, bool]] = {
    # burst center Hz, burst bandwidth, voiced
    "P": (800, 1500, False), "B": (800, 1500, True),
    "T": (4000, 3000, False), "D": (4000, 3000, True),
    "K": (2000, 2000, False), "G": (2000, 2000, True),
    "CH": (3000, 3000, False), "JH": (3000, 3000, True),
}

_NASALS: Dict[str, Tuple[float, float, float]] = {
    "M": (250, 1000, 2200),
    "N": (250, 1700, 2600),
    "NG": (250, 1300, 2500),
}

_LIQUIDS: Dict[str, Tuple[float, float, float]] = {
    "L": (360, 1300, 2700),
    "R": (330, 1100, 1500),
    "W": (300, 700, 2200),
    "Y": (270, 2200, 3000),
}


def _formant_envelope(freqs: np.ndarray, formants: Tuple[float, float, float], scale: float) -> np.ndarray:
    env = np.zeros_like(freqs)
    for f_center, gain in zip(formants, (1.0, 0.6, 0.3)):
        bw = 80.0 + 0.08 * f_center
        env += gain / (1.0 + ((freqs - f_center * scale) / bw) ** 2)
    return env


class FormantSynthesizer:
    """Deterministic text -> 16 kHz float32 waveform synthesis."""

    def __init__(self, sample_rate: int = SAMPLE_RATE) -> None:
        self.sample_rate = sample_rate
        self.phonemizer = SimplePhonemizer()

    def _speaker(self, seed: int) -> Tuple[float, float]:
        """(f0 base Hz, formant scale) derived deterministically from a seed."""
        digest = hashlib.md5(f"spk{seed}".encode()).digest()
        f0 = 95.0 + (digest[0] / 255.0) * 130.0       # 95 - 225 Hz
        scale = 0.88 + (digest[1] / 255.0) * 0.28     # vocal tract length factor
        return f0, scale

    def _voiced(self, duration_s: float, f0: float, formant_track, scale: float,
                rng: np.random.Generator, noise_scale: float) -> np.ndarray:
        n = max(int(duration_s * self.sample_rate), 1)
        t = np.arange(n) / self.sample_rate
        # pitch declination + jitter
        f0_track = f0 * (1.0 - 0.1 * t / max(duration_s, 1e-3))
        f0_track = f0_track * (1.0 + noise_scale * 0.01 * rng.standard_normal())
        phase0 = rng.uniform(0, 2 * np.pi)
        out = np.zeros(n)
        n_harmonics = int(self.sample_rate / 2 / f0) - 1
        harmonics = np.arange(1, max(n_harmonics, 2))
        # time-varying formants (linear interpolation across targets)
        targets = list(formant_track)
        if len(targets) == 1:
            targets = [targets[0], targets[0]]
        alpha = t / max(duration_s, 1e-3)
        f1 = targets[0][0] + (targets[1][0] - targets[0][0]) * alpha
        f2 = targets[0][1] + (targets[1][1] - targets[0][1]) * alpha
        f3 = targets[0][2] + (targets[1][2] - targets[0][2]) * alpha
        phase = 2 * np.pi * np.cumsum(f0_track) / self.sample_rate + phase0
        for h in harmonics:
            freq = h * f0_track
            env = (
                1.0 / (1.0 + ((freq - f1 * scale) / (80 + 0.08 * f1)) ** 2)
                + 0.6 / (1.0 + ((freq - f2 * scale) / (80 + 0.08 * f2)) ** 2)
                + 0.3 / (1.0 + ((freq - f3 * scale) / (80 + 0.08 * f3)) ** 2)
            )
            out += env * np.sin(h * phase) / np.sqrt(h)
        # amplitude envelope: quick attack, gentle decay
        attack = np.minimum(t / 0.02, 1.0)
        release = np.minimum((duration_s - t) / 0.03, 1.0)
        return out * attack * np.clip(release, 0, 1)

    def _noise(self, duration_s: float, low: float, high: float, level: float,
               rng: np.random.Generator) -> np.ndarray:
        n = max(int(duration_s * self.sample_rate), 1)
        white = rng.standard_normal(n)
        spectrum = np.fft.rfft(white)
        freqs = np.fft.rfftfreq(n, 1.0 / self.sample_rate)
        band = (freqs >= low) & (freqs <= high)
        spectrum[~band] *= 0.05
        shaped = np.fft.irfft(spectrum, n)
        shaped = shaped / (np.abs(shaped).max() + 1e-9) * level
        t = np.arange(n) / self.sample_rate
        attack = np.minimum(t / 0.01, 1.0)
        release = np.clip((duration_s - t) / 0.02, 0, 1)
        return shaped * attack * release

    def synthesize(
        self,
        text: str,
        speaker: int = 0,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """Synthesize ``text`` to a float32 waveform in [-1, 1]."""
        if seed is None:
            seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "little")
        rng = np.random.default_rng(seed + speaker * 7919)
        f0, scale = self._speaker(speaker)

        pieces: List[np.ndarray] = []
        pause = np.zeros(int(0.06 * length_scale * self.sample_rate))
        for word in text.split():
            phones = self.phonemizer.word_phones(word)
            for ph in phones:
                dur_jitter = 1.0 + noise_scale * 0.15 * rng.standard_normal()
                if ph in _VOWELS:
                    dur = 0.12 * length_scale * max(dur_jitter, 0.5)
                    pieces.append(self._voiced(dur, f0, _VOWELS[ph], scale, rng, noise_scale))
                elif ph in _FRICATIVES:
                    low, high, level = _FRICATIVES[ph]
                    dur = 0.08 * length_scale * max(dur_jitter, 0.5)
                    frict = self._noise(dur, low * scale, high * scale, level, rng)
                    if ph in ("Z", "ZH", "V", "DH"):
                        frict = frict + 0.5 * self._voiced(dur, f0, ((300, 1400, 2500),), scale, rng, noise_scale)
                    pieces.append(frict)
                elif ph in _STOPS:
                    center, bw, voiced = _STOPS[ph]
                    gap = np.zeros(int(0.035 * length_scale * self.sample_rate))
                    burst = self._noise(0.025 * length_scale, (center - bw / 2) * scale,
                                        (center + bw / 2) * scale, 0.5, rng)
                    if voiced:
                        burst = burst + 0.3 * self._voiced(0.025 * length_scale, f0,
                                                           ((300, 1200, 2400),), scale, rng, noise_scale)
                    pieces.extend([gap, burst])
                elif ph in _NASALS:
                    dur = 0.09 * length_scale * max(dur_jitter, 0.5)
                    pieces.append(0.6 * self._voiced(dur, f0, (_NASALS[ph],), scale, rng, noise_scale))
                elif ph in _LIQUIDS:
                    dur = 0.08 * length_scale * max(dur_jitter, 0.5)
                    pieces.append(0.8 * self._voiced(dur, f0, (_LIQUIDS[ph],), scale, rng, noise_scale))
                else:  # unknown phone: schwa-ish
                    dur = 0.07 * length_scale
                    pieces.append(0.5 * self._voiced(dur, f0, ((500, 1500, 2500),), scale, rng, noise_scale))
            pieces.append(pause)

        audio = np.concatenate(pieces) if pieces else np.zeros(self.sample_rate // 10)
        peak = np.abs(audio).max() + 1e-9
        return (audio / peak * 0.7).astype(np.float32)
