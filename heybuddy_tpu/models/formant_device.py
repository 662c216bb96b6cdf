"""
Device-resident formant TTS: plan on the host, render on the TPU.

END_TO_END.md measures the training pipeline as HOST-BOUND: the numpy
formant renderer synthesizes ~61 clips/s/core while the device featurizes
~289k clips/s, so at the reference's default scale (275k clips,
reference README.md:55-73) TTS dominates the wall clock. This module moves
the rendering FLOPs — the hot ~97% of synthesis — onto the TPU:

* the **host** keeps the cheap, irregular work it is good at: phonemize ->
  segment plan -> formant/F0 control tracks (`FormantSynthesizer._plan`,
  `_build_tracks`, `_f0_track` are reused verbatim, so the utterance's
  segment layout, formant trajectories, pitch contour and phase are
  IDENTICAL to the host backend's), then decimates every track 64x
  (~4 ms hop) so a clip uploads as ~18 KB of tracks instead of ~80 KB of
  audio — the host->device link is the scarcest resource on a tunneled
  chip (PERF.md: ~15 MB/s);
* the **device** upsamples the tracks (linear interpolation), renders the
  voiced source-filter sum with the same Chebyshev sin recurrence as the
  host hot loop (one fused elementwise XLA program — the harmonic loop is
  UNROLLED so no (batch, samples) array round-trips HBM per harmonic),
  and synthesizes the unvoiced residue (bursts/fricatives/aspiration) as
  white noise shaped per 8 ms frame by a matmul DFT -> spectral-envelope
  multiply -> matmul iDFT -> overlap-add — MXU work instead of the host's
  per-segment FFTs.

Differences from the host renderer (``models/formant.py``) are confined to
the stochastic residue: device noise draws from a per-clip JAX PRNG stream
(deterministic, batch-composition independent) rather than the numpy
generator, harmonics are gated per-sample at Nyquist instead of globally at
``sr/2/f0_max``, and noise spectral shaping happens at 125 Hz frame
resolution instead of per-segment FFT resolution. The voiced path — tracks,
phase, envelopes — is numerically the host's. ``tests/test_formant_device.py``
holds the two backends to close log-mel agreement per clip.

Reference parity: this replaces the reference's GPU Piper/VITS synthesis
stage (reference piper/pretrained.py:283-425) as the air-gapped data engine;
the sampling contract (speakers/settings grids) is inherited from
``BaseTTS`` unchanged.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from heybuddy_tpu.constants import SAMPLE_RATE
from heybuddy_tpu.models.formant import FormantSynthesizer

__all__ = [
    "DEVICE_FORMANT_VERSION",
    "ClipPlan",
    "DeviceFormantPlanner",
    "render_batch",
]

# Bump when device rendering changes: artifacts keyed on rendered audio use
# it (the host backend keys on models.formant.FORMANT_VERSION separately).
DEVICE_FORMANT_VERSION = 1

TRACK_STRIDE = 64            # decimation hop: 4 ms @ 16 kHz
NOISE_FFT = 128              # unvoiced shaping frame (8 ms), hop = NOISE_FFT // 2
MAX_NOISE_SEGMENTS = 24      # clips with more fall back to the host renderer
DEFAULT_MAX_SAMPLES = 48000  # 3.0 s @ 16 kHz
DEFAULT_HARMONICS = 100      # covers f0 >= ~80 Hz up to Nyquist
_N_TRACKS = 8                # f0, phase, f1, f2, f3, amp, nasal, zero
_PEAK_FACTOR = 3.3           # E[peak]/sigma of the host's peak-normalized noise

_KIND_BAND = 0.0             # fricative band noise (attack/release ramps)
_KIND_ASPIRATION = 1.0       # vowel-formant-shaped noise (linear 1->0.2 fade)


@dataclass
class ClipPlan:
    """Host-side plan for one clip: everything the device renderer needs."""

    length: int              # rendered samples (<= max_samples)
    scale: float             # speaker vocal-tract scale factor
    noise_scale: float       # breathiness level
    clip_seed: int           # device PRNG stream id
    tracks: np.ndarray       # (8, Ld) f32 decimated tracks
    noise_table: np.ndarray  # (MAX_NOISE_SEGMENTS, 9) f32


class DeviceFormantPlanner:
    """Text -> :class:`ClipPlan` using the host synthesizer's own planning."""

    def __init__(self, sample_rate: int = SAMPLE_RATE,
                 max_samples: int = DEFAULT_MAX_SAMPLES) -> None:
        assert max_samples % TRACK_STRIDE == 0
        self.sample_rate = sample_rate
        self.max_samples = max_samples
        self.n_dec = max_samples // TRACK_STRIDE + 1
        self.synth = FormantSynthesizer(sample_rate)

    def plan(
        self,
        text: str,
        speaker: int = 0,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        seed: Optional[int] = None,
        speaker_params: Optional[Tuple[float, float]] = None,
    ) -> Optional[ClipPlan]:
        """Build a device plan, or None when the clip needs the host fallback
        (too long for the compiled shape, or too many noise segments).
        ``speaker_params`` overrides the speaker-derived voice exactly like
        ``FormantSynthesizer.synthesize``."""
        import hashlib

        if seed is None:
            seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "little")
        rng = np.random.default_rng(seed + speaker * 7919)
        f0, scale = speaker_params or self.synth._speaker(speaker)
        sr = self.sample_rate

        segments = self.synth._plan(text, length_scale, noise_scale, rng)
        if not segments:
            return None
        cursor = 0
        for seg in segments:
            seg.start = cursor
            seg.n = max(int(seg.dur * sr), 1)
            cursor += seg.n
        total = cursor + int(0.02 * sr)
        if total > self.max_samples:
            return None

        noise_segments = [s for s in segments if s.noise is not None and s.n > 0]
        if len(noise_segments) > MAX_NOISE_SEGMENTS:
            return None

        # Identical rng consumption order to FormantSynthesizer.synthesize,
        # with every track evaluated ONLY at the decimated grid (the full-rate
        # evaluation was ~80% of planning cost). The device reconstructs
        # intra-interval phase by integrating the linearly-interpolated f0, so
        # the knot phases here use the matching trapezoid accumulation.
        n_dec = self.n_dec
        positions = np.arange(n_dec, dtype=np.float64) * TRACK_STRIDE
        f1, f2, f3, amp, nasal, zero_f = self.synth._build_tracks(
            segments, total, rng, noise_scale, positions=positions)
        f0_track = self.synth._f0_track(
            segments, total, f0, rng, noise_scale, positions=positions)
        steps = (f0_track[:-1] + f0_track[1:]) * (0.5 * TRACK_STRIDE)
        phase = rng.uniform(0, 2 * np.pi) + (2.0 * np.pi / sr) * np.concatenate(
            [[0.0], np.cumsum(steps)])

        tracks = np.stack([
            f0_track.astype(np.float32),
            phase.astype(np.float32),
            f1, f2, f3,
            np.where(positions < total, amp, 0.0).astype(np.float32),
            np.where(positions < total, nasal, 0.0).astype(np.float32),
            zero_f,
        ])

        table = np.zeros((MAX_NOISE_SEGMENTS, 9), np.float32)
        table[:, 1] = 1.0   # n: avoid 0-division on unused rows
        table[:, 7] = 0.01  # attack
        table[:, 8] = 0.01  # release
        for i, seg in enumerate(noise_segments):
            low, high, level = seg.noise
            if seg.kind == "aspiration":
                tg = seg.targets[0] if seg.targets else (500.0, 1500.0, 2500.0)
                table[i] = (seg.start, seg.n, level, _KIND_ASPIRATION,
                            tg[0], tg[1], tg[2], 0.0, 0.0)
            else:
                attack_s, release_s = (
                    (0.002, 0.008) if seg.kind == "burst" else (0.01, 0.02))
                table[i] = (seg.start, seg.n, level, _KIND_BAND,
                            low, high, 0.0, attack_s, release_s)

        return ClipPlan(
            length=total,
            scale=float(scale),
            noise_scale=float(noise_scale),
            clip_seed=int(seed + speaker * 7919) & 0x7FFFFFFF,
            tracks=tracks,
            noise_table=table,
        )


# --------------------------------------------------------------------- device

@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int = NOISE_FFT):
    """rfft/irfft as matmuls (np.fft conventions, verified in tests)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    dft_c = np.cos(ang).astype(np.float32)            # (N, K): Re
    dft_s = (-np.sin(ang)).astype(np.float32)         # (N, K): Im
    w = np.full(n_fft // 2 + 1, 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    ang2 = 2.0 * np.pi * np.outer(k, n) / n_fft
    idft_re = (w[:, None] * np.cos(ang2) / n_fft).astype(np.float32)   # (K, N)
    idft_im = (-w[:, None] * np.sin(ang2) / n_fft).astype(np.float32)  # (K, N)
    return dft_c, dft_s, idft_re, idft_im


def _upsample(x, stride: int, length: int):
    """(B, Ld) decimated track -> (B, length) by linear interpolation."""
    import jax.numpy as jnp

    a = x[:, :-1, None]
    b = x[:, 1:, None]
    frac = jnp.arange(stride, dtype=jnp.float32)[None, None, :] / stride
    full = (a + (b - a) * frac).reshape(x.shape[0], -1)
    return full[:, :length]


def _render_impl(tracks, noise_table, scale, noise_scale, length, seeds,
                 *, l_max: int, harmonics: int, sample_rate: int):
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    sr = float(sample_rate)
    stride = TRACK_STRIDE
    b = tracks.shape[0]

    f0_d = tracks[:, 0]
    ph_d = tracks[:, 1]
    scale_c = scale[:, None]

    # ---- voiced: upsample tracks, integrate phase analytically per run ----
    f0a, f0b = f0_d[:, :-1, None], f0_d[:, 1:, None]
    j = jnp.arange(stride, dtype=f32)[None, None, :]
    incr = (2.0 * np.pi / sr) * (f0a * j + (f0b - f0a) * (j * j) / (2.0 * stride))
    phase = (ph_d[:, :-1, None] + incr).reshape(b, -1)[:, :l_max]
    f0 = _upsample(f0_d, stride, l_max)
    f1s = _upsample(tracks[:, 2], stride, l_max) * scale_c
    f2s = _upsample(tracks[:, 3], stride, l_max) * scale_c
    f3s = _upsample(tracks[:, 4], stride, l_max) * scale_c
    amp = _upsample(tracks[:, 5], stride, l_max)
    nasal = _upsample(tracks[:, 6], stride, l_max)
    zs = _upsample(tracks[:, 7], stride, l_max) * scale_c

    inv_bw1 = 1.0 / (80.0 + 0.08 * f1s + 160.0 * nasal)
    inv_bw2 = 1.0 / (80.0 + 0.08 * f2s)
    inv_bw3 = 1.0 / (80.0 + 0.08 * f3s)
    g2 = 0.6 * (1.0 - 0.35 * nasal)
    g3 = 0.3 * (1.0 - 0.35 * nasal)
    nasal_gain = 0.85 * nasal
    murmur = 0.5 * nasal
    mur_center = 280.0 * scale_c
    nyquist = f32(0.5 * sr)

    two_cos = 2.0 * jnp.cos(phase)
    sin_h = jnp.sin(phase)
    sin_prev = jnp.zeros_like(sin_h)
    acc = jnp.zeros_like(sin_h)
    # Unrolled on purpose: a lax loop would round-trip every (b, l_max)
    # carry through HBM once per harmonic; unrolled, XLA fuses the whole
    # accumulation into one elementwise program over the input tracks.
    for h in range(1, harmonics + 1):
        freq = f32(h) * f0
        x1 = (freq - f1s) * inv_bw1
        x2 = (freq - f2s) * inv_bw2
        x3 = (freq - f3s) * inv_bw3
        env = (
            1.0 / (1.0 + x1 * x1)
            + g2 / (1.0 + x2 * x2)
            + g3 / (1.0 + x3 * x3)
        )
        xz = (freq - zs) * f32(1.0 / 300.0)
        env = env * (1.0 - nasal_gain / (1.0 + xz * xz))
        xm = (freq - mur_center) * f32(1.0 / 120.0)
        env = env + murmur / (1.0 + xm * xm)
        gate = (freq < nyquist).astype(f32)
        acc = acc + (gate * env * f32(1.0 / np.sqrt(h))) * sin_h
        sin_prev, sin_h = sin_h, two_cos * sin_h - sin_prev
    voiced = acc * amp

    # ---- per-clip deterministic noise streams ----
    def _clip_noise(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0x600DF00D), seed)
        breath = jax.random.normal(jax.random.fold_in(key, 0), (l_max,), f32)
        white = jax.random.normal(jax.random.fold_in(key, 1), (l_max + NOISE_FFT,), f32)
        return breath, white

    breath, white = jax.vmap(_clip_noise)(seeds)
    voiced = voiced + breath * (0.02 * noise_scale[:, None]) * amp

    # ---- unvoiced: frame -> DFT -> spectral envelope -> iDFT -> OLA ----
    n_fft = NOISE_FFT
    hop = n_fft // 2
    n_frames = l_max // hop
    dft_c, dft_s, idft_re, idft_im = _dft_matrices(n_fft)
    hann = np.hanning(n_fft + 1)[:-1].astype(np.float32)  # periodic: OLA == 1
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    frames = white[:, idx] * jnp.asarray(hann)
    re = frames @ jnp.asarray(dft_c)
    im = frames @ jnp.asarray(dft_s)

    # time envelope per (segment, frame)
    start = noise_table[:, :, 0][:, :, None]
    seg_n = noise_table[:, :, 1][:, :, None]
    level = noise_table[:, :, 2][:, :, None]
    kind = noise_table[:, :, 3][:, :, None]
    att_s = noise_table[:, :, 7][:, :, None]
    rel_s = noise_table[:, :, 8][:, :, None]
    t_c = jnp.arange(n_frames, dtype=f32)[None, None, :] * hop + hop
    tr = (t_c - start) / sr                       # (B, S, F) seconds into segment
    ns = seg_n / sr
    ramp_band = (jnp.clip(tr / jnp.maximum(att_s, 1e-4), 0.0, 1.0)
                 * jnp.clip((ns - tr) / jnp.maximum(rel_s, 1e-4), 0.0, 1.0))
    fade_asp = jnp.clip((ns - tr) / jnp.maximum(ns, 1e-4), 0.2, 1.0)
    ramp = jnp.where(kind > 0.5, fade_asp, ramp_band)
    active = ((tr >= 0.0) & (tr < ns)).astype(f32)
    lvl_sf = level * ramp * active                # (B, S, F)

    # spectral shape per (segment, bin) — band edges / formant targets are
    # constant within a segment, so shaping factorizes into a matmul.
    freqs = jnp.asarray(
        np.fft.rfftfreq(n_fft, 1.0 / sr).astype(np.float32))[None, None, :]
    kind_s = noise_table[:, :, 3][:, :, None]
    pa = noise_table[:, :, 4][:, :, None] * scale[:, None, None]
    pb = noise_table[:, :, 5][:, :, None] * scale[:, None, None]
    pc = noise_table[:, :, 6][:, :, None] * scale[:, None, None]
    edge = 40.0
    band_mask = (jax.nn.sigmoid((freqs - pa) / edge)
                 * jax.nn.sigmoid((pb - freqs) / edge))
    shape_band = 0.05 + 0.95 * band_mask
    pa_raw = noise_table[:, :, 4][:, :, None]
    pb_raw = noise_table[:, :, 5][:, :, None]
    pc_raw = noise_table[:, :, 6][:, :, None]
    shape_asp = (
        1.0 / (1.0 + ((freqs - pa) / (150.0 + 0.1 * pa_raw)) ** 2)
        + 0.7 / (1.0 + ((freqs - pb) / (150.0 + 0.1 * pb_raw)) ** 2)
        + 0.4 / (1.0 + ((freqs - pc) / (150.0 + 0.1 * pc_raw)) ** 2)
    )
    shape = jnp.where(kind_s > 0.5, shape_asp, shape_band)  # (B, S, K)
    # Normalize so the time-domain amplitude matches the host's
    # peak-normalize-to-level convention (peak ~= _PEAK_FACTOR * sigma).
    rms = jnp.sqrt(jnp.mean(shape * shape, axis=2, keepdims=True))
    shape = shape / (_PEAK_FACTOR * jnp.maximum(rms, 1e-6))

    env = jnp.einsum("bsf,bsk->bfk", lvl_sf, shape)          # (B, F, K)
    out_frames = (re * env) @ jnp.asarray(idft_re) + (im * env) @ jnp.asarray(idft_im)
    first = out_frames[:, :, :hop].reshape(b, -1)
    second = out_frames[:, :, hop:].reshape(b, -1)
    unvoiced = first + jnp.concatenate(
        [jnp.zeros((b, hop), f32), second[:, :-hop]], axis=1)

    # ---- mix, mask, peak-normalize (host synthesize contract) ----
    audio = voiced + unvoiced
    mask = (jnp.arange(l_max)[None, :] < length[:, None]).astype(f32)
    audio = audio * mask
    peak = jnp.max(jnp.abs(audio), axis=1, keepdims=True)
    return audio / jnp.maximum(peak, 1e-9) * 0.7


@functools.lru_cache(maxsize=None)
def _jitted_render(l_max: int, harmonics: int, sample_rate: int):
    import jax

    return jax.jit(functools.partial(
        _render_impl, l_max=l_max, harmonics=harmonics, sample_rate=sample_rate))


def _center_place(clip, lengths, target: int):
    """(B, target) left-aligned clips -> centered (the pad-only validation
    placement, matching AugmentedAudioGenerator.execute_augment_batch)."""
    import jax.numpy as jnp

    offset = (target - lengths) // 2
    idx = jnp.arange(target)[None, :] - offset[:, None]
    valid = (idx >= 0) & (idx < lengths[:, None])
    gathered = jnp.take_along_axis(clip, jnp.clip(idx, 0, target - 1), axis=1)
    return jnp.where(valid, gathered, 0.0)


def _fused_features_impl(tracks, table, scale, noise_scale, length, seeds,
                         noise_bank, impulse_bank, aug_key, params,
                         *, l_max: int, harmonics: int, sample_rate: int,
                         clip_samples: int, config: Any, pad_only: bool):
    """plans -> (B, n_windows, 96) features with audio never leaving HBM:
    render -> (augment | center-place) -> featurize in ONE compiled program.

    The synthesized waveform is rescaled from the renderer's +-0.7 peak to
    the +-1.0 peak the augment chain sees from the host path (int16
    peak-normalization there). Background noise/impulses come from an
    HBM-resident bank: rows are chosen per clip from ``aug_key`` (fold paths
    1000/1001, disjoint from augment_batch's internal split(12)).
    """
    import jax
    import jax.numpy as jnp

    from heybuddy_tpu.models.featurizer import featurize_batch
    from heybuddy_tpu.ops.augment import augment_batch

    audio = _render_impl(tracks, table, scale, noise_scale, length, seeds,
                         l_max=l_max, harmonics=harmonics,
                         sample_rate=sample_rate)
    clip = audio[:, :clip_samples] * (1.0 / 0.7)
    lengths = jnp.minimum(length, clip_samples)
    if pad_only:
        staged = _center_place(clip, lengths, clip_samples)
    else:
        b = clip.shape[0]
        rows_n = jax.random.randint(
            jax.random.fold_in(aug_key, 1000), (b,), 0, noise_bank.shape[0])
        rows_i = jax.random.randint(
            jax.random.fold_in(aug_key, 1001), (b,), 0, impulse_bank.shape[0])
        staged = augment_batch(
            aug_key, clip, lengths, noise_bank[rows_n], impulse_bank[rows_i],
            config)
    return featurize_batch(params, staged * 32767.0)


@functools.lru_cache(maxsize=None)
def _jitted_fused_features(l_max: int, harmonics: int, sample_rate: int,
                           clip_samples: int, config: Any, pad_only: bool):
    import jax

    return jax.jit(functools.partial(
        _fused_features_impl, l_max=l_max, harmonics=harmonics,
        sample_rate=sample_rate, clip_samples=clip_samples, config=config,
        pad_only=pad_only))


def pack_plans(plans: List[ClipPlan], l_max: int, pad_to: Optional[int] = None
               ) -> Dict[str, np.ndarray]:
    """Batch ClipPlans into the device input arrays (padded to ``pad_to``)."""
    n = len(plans)
    b = max(pad_to or n, n)
    n_dec = l_max // TRACK_STRIDE + 1
    tracks = np.zeros((b, _N_TRACKS, n_dec), np.float32)
    table = np.zeros((b, MAX_NOISE_SEGMENTS, 9), np.float32)
    table[:, :, 1] = 1.0
    table[:, :, 7:9] = 0.01
    scale = np.ones((b,), np.float32)
    noise_scale = np.zeros((b,), np.float32)
    length = np.zeros((b,), np.int32)
    seeds = np.zeros((b,), np.uint32)
    for i, plan in enumerate(plans):
        assert plan.tracks.shape == (_N_TRACKS, n_dec), (
            f"plan built for different max_samples: {plan.tracks.shape}")
        tracks[i] = plan.tracks
        table[i] = plan.noise_table
        scale[i] = plan.scale
        noise_scale[i] = plan.noise_scale
        length[i] = plan.length
        seeds[i] = plan.clip_seed
    tracks[n:, 0] = 100.0
    return {
        "tracks": tracks, "table": table, "scale": scale,
        "noise_scale": noise_scale, "length": length, "seeds": seeds,
    }


def fused_features_batch(
    plans: List[ClipPlan],
    params: Any,
    aug_key: Any,
    noise_bank: Any,
    impulse_bank: Any,
    config: Any,
    pad_only: bool = False,
    l_max: int = DEFAULT_MAX_SAMPLES,
    harmonics: int = DEFAULT_HARMONICS,
    sample_rate: int = SAMPLE_RATE,
    clip_samples: Optional[int] = None,
    pad_to: Optional[int] = None,
) -> Tuple[Any, int]:
    """Dispatch one fused plans->features batch; returns (device array, n).

    Asynchronous like ``SpeechEmbeddings.featurize_device``: the caller
    materializes the previous batch's result while this one computes.
    """
    from heybuddy_tpu.constants import CLIP_SAMPLES

    clip_samples = clip_samples or CLIP_SAMPLES
    packed = pack_plans(plans, l_max, pad_to=pad_to)
    fn = _jitted_fused_features(
        l_max, harmonics, sample_rate, clip_samples, config, pad_only)
    out = fn(packed["tracks"], packed["table"], packed["scale"],
             packed["noise_scale"], packed["length"], packed["seeds"],
             noise_bank, impulse_bank, aug_key, params)
    return out, len(plans)


def render_batch(
    plans: List[ClipPlan],
    l_max: int = DEFAULT_MAX_SAMPLES,
    harmonics: int = DEFAULT_HARMONICS,
    sample_rate: int = SAMPLE_RATE,
    pad_to: Optional[int] = None,
) -> List[np.ndarray]:
    """Render clip plans on the default device -> float32 waveforms in [-1, 1].

    ``pad_to`` pads the batch dimension so tail batches reuse the compiled
    program (a new batch shape is a fresh 40-500 s remote compile on the
    tunneled TPU).
    """
    if not plans:
        return []
    packed = pack_plans(plans, l_max, pad_to=pad_to)
    out = _jitted_render(l_max, harmonics, sample_rate)(
        packed["tracks"], packed["table"], packed["scale"],
        packed["noise_scale"], packed["length"], packed["seeds"])
    host = np.asarray(out)
    return [host[i, : plans[i].length].astype(np.float32) for i in range(len(plans))]
