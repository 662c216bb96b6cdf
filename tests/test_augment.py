"""On-device augmentation chain: statistical and structural checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heybuddy_tpu.constants import CLIP_SAMPLES
from heybuddy_tpu.ops.augment import AugmentConfig, augment_batch, random_center_pad
from heybuddy_tpu.ops import augment as aug


def make_batch(b=4, length=16000, seed=0):
    rng = np.random.default_rng(seed)
    audio = np.zeros((b, CLIP_SAMPLES), dtype=np.float32)
    tone = 0.3 * np.sin(2 * np.pi * 440 * np.arange(length) / 16000).astype(np.float32)
    audio[:, :length] = tone
    lengths = np.full((b,), length, dtype=np.int32)
    return jnp.asarray(audio), jnp.asarray(lengths)


def test_augment_batch_shapes_and_range():
    audio, lengths = make_batch()
    noise = jnp.asarray(np.random.default_rng(1).normal(0, 0.05, audio.shape).astype(np.float32))
    impulse = jnp.zeros((audio.shape[0], 4000), dtype=jnp.float32).at[:, 0].set(1.0)
    out = augment_batch(jax.random.PRNGKey(0), audio, lengths, noise, impulse)
    out = np.asarray(out)
    assert out.shape == audio.shape
    assert np.abs(out).max() <= 1.0
    assert np.isfinite(out).all()


def test_augment_deterministic_per_key():
    audio, lengths = make_batch()
    noise = jnp.zeros_like(audio)
    impulse = jnp.zeros((audio.shape[0], 1024), dtype=jnp.float32)
    a = np.asarray(augment_batch(jax.random.PRNGKey(7), audio, lengths, noise, impulse))
    b = np.asarray(augment_batch(jax.random.PRNGKey(7), audio, lengths, noise, impulse))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(augment_batch(jax.random.PRNGKey(8), audio, lengths, noise, impulse))
    assert not np.allclose(a, c)


def test_probability_zero_is_identity_up_to_padding():
    audio, lengths = make_batch(length=CLIP_SAMPLES)  # full length: no padding freedom
    cfg = AugmentConfig(
        seven_band_prob=0.0, tanh_distortion_prob=0.0, pitch_shift_prob=0.0,
        band_stop_prob=0.0, colored_noise_prob=0.0, background_noise_prob=0.0,
        gain_prob=0.0, reverb_prob=0.0,
    )
    noise = jnp.zeros_like(audio)
    impulse = jnp.zeros((audio.shape[0], 512), dtype=jnp.float32)
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), audio, lengths, noise, impulse, cfg))
    np.testing.assert_allclose(out, np.asarray(audio), atol=1e-6)


def test_random_center_pad_preserves_content():
    audio, lengths = make_batch(length=8000)
    out = np.asarray(random_center_pad(jax.random.PRNGKey(3), audio, lengths))
    src = np.asarray(audio)
    for i in range(out.shape[0]):
        # energy preserved, just relocated
        np.testing.assert_allclose(np.sum(out[i] ** 2), np.sum(src[i] ** 2), rtol=1e-4)


def test_background_noise_hits_target_snr():
    audio, _ = make_batch(length=CLIP_SAMPLES)
    noise = jnp.asarray(
        np.random.default_rng(2).normal(0, 1.0, audio.shape).astype(np.float32)
    )
    cfg = AugmentConfig(background_noise_min_snr_db=10.0, background_noise_max_snr_db=10.0)
    mixed = np.asarray(aug._background_noise(jax.random.PRNGKey(0), audio, noise, cfg))
    added = mixed - np.asarray(audio)
    snr = 10 * np.log10(np.mean(np.asarray(audio) ** 2) / np.mean(added**2))
    assert abs(snr - 10.0) < 0.5


def test_gain_range():
    audio, _ = make_batch(length=CLIP_SAMPLES)
    cfg = AugmentConfig(gain_min_db=-6.0, gain_max_db=-6.0)
    out = np.asarray(aug._gain(jax.random.PRNGKey(0), audio, cfg))
    ratio = np.sqrt(np.mean(out**2) / np.mean(np.asarray(audio) ** 2))
    np.testing.assert_allclose(ratio, 10 ** (-6 / 20), rtol=1e-3)


def test_band_stop_attenuates_target_band():
    # 1 kHz tone, notch centered on it should reduce energy substantially.
    t = CLIP_SAMPLES
    tone = 0.5 * np.sin(2 * np.pi * 1000 * np.arange(t) / 16000).astype(np.float32)
    audio = jnp.asarray(tone[None])
    # Force a notch exactly at 1 kHz by monkeypatched uniform? Instead run many
    # keys and verify at least one attenuates the tone heavily.
    attenuations = []
    for seed in range(8):
        out = np.asarray(aug._band_stop(jax.random.PRNGKey(seed), audio, AugmentConfig()))[0]
        attenuations.append(np.sum(out**2) / np.sum(tone**2))
    assert min(attenuations) < 0.5


def test_reverb_smears_energy():
    t = CLIP_SAMPLES
    click = np.zeros((1, t), dtype=np.float32)
    click[0, 1000] = 1.0
    ir = np.zeros((1, 2048), dtype=np.float32)
    ir[0, 0] = 1.0
    ir[0, 500] = 0.5
    out = np.asarray(aug._reverb(jnp.asarray(click), jnp.asarray(ir)))[0]
    assert abs(out[1500]) > 0.1  # echo present


def test_edge_pad_produces_partial_views():
    """Every clip straddles a window edge with a bounded visible fraction."""
    from heybuddy_tpu.ops.augment import edge_pad

    b, length = 32, 16000
    rng = np.random.default_rng(3)
    audio = np.zeros((b, CLIP_SAMPLES), dtype=np.float32)
    # Nowhere-zero content so visibility is measurable exactly.
    audio[:, :length] = rng.uniform(0.1, 1.0, (b, length)).astype(np.float32)
    lengths = jnp.full((b,), length, dtype=jnp.int32)
    out = np.asarray(edge_pad(jax.random.PRNGKey(0), jnp.asarray(audio), lengths,
                              min_visible=0.30, max_visible=0.80))
    assert out.shape == (b, CLIP_SAMPLES)
    for i in range(b):
        nonzero = np.nonzero(np.abs(out[i]) > 0)[0]
        visible = nonzero.size
        # visible fraction respects the configured bounds
        assert 0.28 * length <= visible <= 0.82 * length
        # content is contiguous and flush against exactly one window edge
        assert nonzero[-1] - nonzero[0] + 1 == visible
        at_start = nonzero[0] == 0
        at_end = nonzero[-1] == CLIP_SAMPLES - 1
        assert at_start != at_end
        if at_end:  # head mode: the clip's BEGINNING is visible
            np.testing.assert_array_equal(out[i, nonzero[0]:], audio[i, :visible])
        else:  # tail mode: the clip's END is visible
            np.testing.assert_array_equal(out[i, :visible], audio[i, length - visible:length])


def test_augment_batch_edge_placement():
    """placement='edge' flows through the full jitted chain."""
    audio, lengths = make_batch(b=8)
    noise = jnp.zeros_like(audio)
    impulse = jnp.zeros((8, 256), dtype=jnp.float32)
    cfg = AugmentConfig(
        seven_band_prob=0.0, tanh_distortion_prob=0.0, pitch_shift_prob=0.0,
        band_stop_prob=0.0, colored_noise_prob=0.0, background_noise_prob=0.0,
        gain_prob=0.0, reverb_prob=0.0, placement="edge",
    )
    out = np.asarray(augment_batch(jax.random.PRNGKey(1), audio, lengths, noise, impulse, cfg))
    # with all other augments off, each row is a strict partial view: less
    # total energy than the full clip, and nonzero
    full_energy = float(np.sum(np.asarray(audio)[0] ** 2))
    for row in out:
        e = float(np.sum(row**2))
        assert 0.0 < e < full_energy


def test_prepare_clip_normalizes_all_integer_dtypes():
    """int16/int32/uint8 sources must all land in [-1, 1] (ADVICE r2 low:
    only int16 was special-cased; int32 overflowed the >4.0 heuristic's
    assumption and uint8 kept a huge DC offset)."""
    from heybuddy_tpu.data.augmented import AugmentedAudioGenerator

    gen = AugmentedAudioGenerator(iter([]), pad_only=True)
    t = np.sin(2 * np.pi * 440 * np.arange(1600) / 16000)

    def clip_for(arr):
        return gen._prepare_clip(
            {"audio": {"array": arr, "sampling_rate": 16000}}
        )

    f32 = clip_for((0.5 * t).astype(np.float32))
    i16 = clip_for((0.5 * t * 32768).astype(np.int16))
    i32 = clip_for((0.5 * t * 2147483648).astype(np.int32))
    u8 = clip_for(((0.5 * t + 1.0) * 127.5).astype(np.uint8))
    for out in (f32, i16, i32, u8):
        assert np.abs(out).max() <= 1.0
        np.testing.assert_allclose(np.abs(out).max(), 0.5, atol=0.02)
    np.testing.assert_allclose(i32, f32, atol=1e-3)
    np.testing.assert_allclose(i16, f32, atol=1e-3)
    # uint8 is coarse but must be centered: mean ~0, not ~128
    assert abs(np.mean(u8)) < 0.05


def test_pitch_shift_rescales_lengths_and_fills_silence():
    """The resampling pitch shift changes effective duration: returned
    lengths must rescale by 1/ratio (stale lengths made placement wrap phrase
    tails around the window edge) and out-of-support reads must be silence,
    not a clamped DC plateau."""
    import jax
    import jax.numpy as jnp

    from heybuddy_tpu.ops.augment import AugmentConfig, _pitch_shift

    t = 23040
    cfg = AugmentConfig()
    key = jax.random.PRNGKey(3)
    # replicate the kernel's own draw to know the ratio
    semis = jax.random.uniform(
        key, (), minval=-float(cfg.pitch_shift_semitones),
        maxval=float(cfg.pitch_shift_semitones),
    )
    ratio = float(2.0 ** (semis / 12.0))

    audio = np.zeros((2, t), np.float32)
    lengths = np.array([12000, t], np.int32)
    audio[0, :12000] = 1.0
    audio[1, :] = 1.0
    out, new_lengths = _pitch_shift(key, jnp.asarray(audio), jnp.asarray(lengths), cfg)
    out = np.asarray(out)
    new_lengths = np.asarray(new_lengths)

    expected = np.minimum(np.ceil(lengths / ratio), t).astype(np.int32)
    np.testing.assert_array_equal(new_lengths, expected)
    # support ends where reads pass the original occupied region
    assert abs(out[0, : new_lengths[0] - 1]).min() > 0.4
    assert abs(out[0, new_lengths[0] + 1 :]).max() == 0.0
    # positions past the source window read silence for the full-length clip
    if ratio > 1.0:
        end = int((t - 1) / ratio)
        assert abs(out[1, end + 2 :]).max() == 0.0


def test_synthetic_impulse_family():
    """Round-4 IR family: direct path at t=0, sparse early reflections, and
    a pre-delayed two-band diffuse tail (HF decays faster). Guards the
    properties the reverb-robustness work relies on."""
    from heybuddy_tpu.data.augmented import NoiseProvider

    provider = NoiseProvider(seed=0, use_remote=False)
    irs = provider.impulse_batch(16)
    assert irs.shape == (16, provider.ir_samples)
    assert np.isfinite(irs).all()
    sr = provider.sample_rate
    for ir in irs:
        assert ir[0] == 1.0  # unit direct path
        assert np.abs(ir).max() <= 2.0  # direct + reflections stay bounded
        # a diffuse tail exists beyond the early-reflection region...
        assert np.abs(ir[int(0.1 * sr):]).max() > 0.0
        # ...but decays: the last 50 ms sit below the first 50 ms after onset
        head = np.abs(ir[int(0.025 * sr): int(0.075 * sr)]).mean()
        tail = np.abs(ir[-int(0.05 * sr):]).mean()
        assert tail < head
