"""Mel spectrogram numerics: matmul-DFT vs an independent FFT reference."""

import functools

import numpy as np
import jax.numpy as jnp

from heybuddy_tpu.constants import (
    MEL_BINS,
    MEL_HOP_LENGTH,
    MEL_LOG_EPS,
    MEL_N_FFT,
    MEL_SCALE_ADD,
    MEL_SCALE_DIV,
    MEL_WIN_LENGTH,
)
from heybuddy_tpu.ops.melspec import (
    dft_basis,
    frame_audio,
    mel_filterbank,
    mel_spectrogram,
    num_frames,
)


def reference_logmel(audio: np.ndarray) -> np.ndarray:
    """Plain numpy rFFT implementation of the same spectrogram definition."""
    window = np.hanning(MEL_WIN_LENGTH + 1)[:MEL_WIN_LENGTH]
    padded = np.zeros(MEL_N_FFT)
    left = (MEL_N_FFT - MEL_WIN_LENGTH) // 2
    padded[left : left + MEL_WIN_LENGTH] = window
    n = num_frames(audio.shape[-1])
    frames = np.stack([audio[i * MEL_HOP_LENGTH : i * MEL_HOP_LENGTH + MEL_N_FFT] for i in range(n)])
    spec = np.fft.rfft(frames * padded, n=MEL_N_FFT, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank()
    return np.log(mel + MEL_LOG_EPS) / MEL_SCALE_DIV + MEL_SCALE_ADD


def test_frame_count_contract():
    # Matches the reference convention ceil(t/160 - 3) on its test shapes
    # (reference embeddings.py:67, tests/test_embeddings.py).
    assert num_frames(17280) == 105
    assert num_frames(23040) == 141
    for t in (17280, 23040, 32000, 16000):
        assert num_frames(t) == int(np.ceil(t / 160 - 3))


def test_frame_audio_extracts_strided_windows():
    audio = jnp.asarray(np.arange(4096, dtype=np.float32)[None])
    frames = np.asarray(frame_audio(audio))
    assert frames.shape == (1, num_frames(4096), MEL_N_FFT)
    np.testing.assert_array_equal(frames[0, 0], np.arange(512))
    np.testing.assert_array_equal(frames[0, 1], np.arange(160, 672))


def test_matmul_dft_matches_fft_reference():
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 1000.0, (23040,)).astype(np.float32)
    ours = np.asarray(mel_spectrogram(jnp.asarray(audio[None])))[0]
    ref = reference_logmel(audio)
    assert ours.shape == ref.shape == (141, MEL_BINS)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_dft_basis_shape_and_energy():
    basis = dft_basis()
    assert basis.shape == (MEL_N_FFT, 2 * (MEL_N_FFT // 2 + 1))
    fb = mel_filterbank()
    assert fb.shape == (MEL_N_FFT // 2 + 1, MEL_BINS)
    assert (fb >= 0).all()
    # every mel bin has some support
    assert (fb.sum(axis=0) > 0).all()


def test_batched_equals_single():
    rng = np.random.default_rng(1)
    audio = rng.normal(0, 1000.0, (3, 23040)).astype(np.float32)
    batched = np.asarray(mel_spectrogram(jnp.asarray(audio)))
    for i in range(3):
        single = np.asarray(mel_spectrogram(jnp.asarray(audio[i][None])))[0]
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_fused_mel_kernel_interpret_matches_xla():
    """Pallas fused mel kernel (interpreter mode) vs the XLA path."""
    from heybuddy_tpu.ops.pallas.melspec_kernel import mel_spectrogram_pallas

    rng = np.random.default_rng(5)
    audio = jnp.asarray(rng.normal(0, 1000.0, (4, 23040)).astype(np.float32))
    fused = np.asarray(mel_spectrogram_pallas(audio, interpret=True))
    ref = np.asarray(mel_spectrogram(audio))
    assert fused.shape == ref.shape == (4, 141, MEL_BINS)
    np.testing.assert_allclose(fused, ref, atol=5e-3, rtol=1e-4)


def test_fused_mel_kernel_pads_odd_batches_and_lengths():
    """Non-multiple batch sizes and the 17280-sample shape keep the contract."""
    from heybuddy_tpu.ops.pallas.melspec_kernel import mel_spectrogram_pallas

    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.normal(0, 1000.0, (3, 17280)).astype(np.float32))
    fused = np.asarray(mel_spectrogram_pallas(audio, interpret=True))
    ref = np.asarray(mel_spectrogram(audio))
    assert fused.shape == ref.shape == (3, 105, MEL_BINS)
    np.testing.assert_allclose(fused, ref, atol=5e-3, rtol=1e-4)


def test_mel_patches_kernel_matches_glued_layout():
    """``mel_patches_pallas`` must emit EXACTLY the slice+reshape+pad of the
    spectrogram kernel's output (the layout handoff it replaces — a measured
    1.6 ms HBM copy per 2048-clip batch on v5e), including zeroed pad rows
    and the padded batch, for both canonical clip lengths and an odd batch."""
    from heybuddy_tpu.ops.pallas.melspec_kernel import (
        mel_patches_pallas,
        mel_spectrogram_pallas,
    )

    rng = np.random.default_rng(8)
    for b, t in ((4, 23040), (3, 17280)):
        audio = jnp.asarray(rng.normal(0, 1000.0, (b, t)).astype(np.float32))
        patches, num_patches = mel_patches_pallas(audio, interpret=True)
        spec = np.asarray(mel_spectrogram_pallas(audio, interpret=True))
        frames = spec.shape[1]
        usable = (frames // 4) * 4
        assert num_patches == usable // 4
        p_pad = -(-num_patches // 8) * 8
        expect = spec[:, :usable].reshape(b, num_patches, 4 * MEL_BINS)
        expect = np.pad(expect, ((0, 0), (0, p_pad - num_patches), (0, 0)))
        got = np.asarray(patches)
        assert got.shape == (b + (-b) % 16, p_pad, 4 * MEL_BINS)
        # real batch rows: exact layout parity incl. zeroed pad-PATCH rows
        np.testing.assert_allclose(got[:b], expect, atol=1e-5, rtol=1e-5)
        # pad-BATCH rows are the mel of zero audio (finite, discarded later)
        assert np.isfinite(got[b:]).all()


def test_mel_kernel_bf16_dft_stays_within_trunk_quantization():
    """``dft_dtype=bfloat16`` (single MXU pass instead of Mosaic's multi-pass
    f32 default) must keep the scaled log-mel within the embedding trunk's own
    bf16 input quantization (~1.6e-2 for values up to ~4), so the speedup is
    numerically free for the feature contract. Observed interpret-mode max
    |err| vs the f32 kernel: 2.4e-3 on int16-range noise."""
    from heybuddy_tpu.ops.pallas.melspec_kernel import (
        mel_patches_pallas,
        mel_spectrogram_pallas,
    )

    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.normal(0, 3000.0, (4, 23040)).astype(np.float32))
    f32 = np.asarray(mel_spectrogram_pallas(audio, interpret=True))
    b16 = np.asarray(
        mel_spectrogram_pallas(audio, interpret=True, dft_dtype=jnp.bfloat16)
    )
    assert np.abs(f32 - b16).max() < 1e-2
    p32, n = mel_patches_pallas(audio, interpret=True)
    p16, n2 = mel_patches_pallas(audio, interpret=True, dft_dtype=jnp.bfloat16)
    assert n == n2
    assert np.abs(np.asarray(p32) - np.asarray(p16)).max() < 1e-2


def test_featurize_fused_prepatched_matches_banded():
    """The production fused path (mel patches -> embedding, no glue copy) vs
    the XLA banded reference, end to end through featurize_batch."""
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.models.featurizer import featurize_batch

    params = embedding_net.default_params()
    rng = np.random.default_rng(9)
    audio = jnp.asarray(rng.normal(0, 1000.0, (3, 23040)).astype(np.float32))
    import unittest.mock as mock

    import heybuddy_tpu.ops.pallas.embedding_kernel as ek
    import heybuddy_tpu.ops.pallas.melspec_kernel as mk

    # force interpreter mode through the private entries
    with mock.patch.object(
        mk, "mel_patches_pallas", functools.partial(mk.mel_patches_pallas, interpret=True)
    ), mock.patch.object(
        ek,
        "fused_embedding_from_patches",
        functools.partial(ek.fused_embedding_from_patches, interpret=True),
    ):
        fused = np.asarray(featurize_batch(params, audio, pooling="fused"))
        # the pre-patched pipeline vs the old two-kernel + glue-copy pipeline:
        # identical math, so near-exact agreement
        spec = mk.mel_spectrogram_pallas(audio, interpret=True)
        from heybuddy_tpu.ops.windows import embedding_window_starts

        starts = embedding_window_starts(23040)
        old = np.asarray(
            ek.fused_embedding_windows(params, spec, starts, interpret=True)
        )
    assert fused.shape == old.shape == (3, 16, 96)
    assert np.isfinite(fused).all()
    np.testing.assert_allclose(fused, old, atol=2e-2, rtol=1e-3)
    # and f32-reference-class agreement end to end
    import jax.numpy as jnp2

    ref = np.asarray(
        featurize_batch(params, audio, pooling="banded", compute_dtype=jnp2.float32)
    )
    assert np.abs(fused - ref).max() < 0.1


def test_fused_embedding_kernel_interpret_matches_banded():
    """Pallas fused trunk+pool kernel (interpreter mode) vs the XLA paths.

    The kernel matmuls in bfloat16 but keeps rms/softmax/accumulation in
    float32, so it lands CLOSER to the exact f32 gather reference (~0.017 max
    abs on unit-scale embeddings) than the production banded-bf16 XLA path
    does (~0.25) — assert bf16-class agreement with the f32 references.
    """
    import jax.numpy as jnp2

    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.ops.pallas.embedding_kernel import fused_embedding_windows
    from heybuddy_tpu.ops.windows import embedding_window_starts

    params = embedding_net.default_params()
    rng = np.random.default_rng(6)
    audio = jnp.asarray(rng.normal(0, 1000.0, (4, 23040)).astype(np.float32))
    spec = mel_spectrogram(audio)
    starts = embedding_window_starts(23040)
    ref_f32 = np.asarray(
        embedding_net.apply_spectrogram(params, spec, starts, compute_dtype=jnp2.float32)
    )
    ref_banded_f32 = np.asarray(
        embedding_net.apply_spectrogram_banded(
            params, spec, starts, compute_dtype=jnp2.float32
        )
    )
    fused = np.asarray(fused_embedding_windows(params, spec, starts, interpret=True))
    assert fused.shape == ref_f32.shape
    assert np.abs(fused - ref_f32).max() < 0.05
    assert np.abs(fused - ref_banded_f32).max() < 0.05


def test_mega_featurize_kernel_interpret_matches_reference():
    """Single audio->embedding mega-kernel (interpreter mode) vs the exact
    f32 XLA path, for the canonical clip length and the short 17280 shape."""
    import jax.numpy as jnp2

    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.ops.pallas.featurize_kernel import fused_featurize
    from heybuddy_tpu.ops.windows import embedding_window_starts

    params = embedding_net.default_params()
    rng = np.random.default_rng(6)
    for t, n_windows in ((23040, 16), (17280, 4)):
        audio = jnp.asarray(rng.normal(0, 1000.0, (4, t)).astype(np.float32))
        spec = mel_spectrogram(audio)
        starts = embedding_window_starts(t)
        ref_f32 = np.asarray(
            embedding_net.apply_spectrogram(params, spec, starts, compute_dtype=jnp2.float32)
        )
        mega = np.asarray(fused_featurize(params, audio, starts, interpret=True))
        assert mega.shape == ref_f32.shape == (4, n_windows, 96)
        assert np.abs(mega - ref_f32).max() < 0.05


def test_mega_featurize_kernel_odd_batch():
    """Non-tile batch sizes are padded and truncated correctly."""
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.ops.pallas.featurize_kernel import fused_featurize
    from heybuddy_tpu.ops.windows import embedding_window_starts

    params = embedding_net.default_params()
    rng = np.random.default_rng(9)
    starts = embedding_window_starts(23040)
    audio = jnp.asarray(rng.normal(0, 1000.0, (3, 23040)).astype(np.float32))
    out3 = np.asarray(fused_featurize(params, audio, starts, interpret=True))
    out1 = np.asarray(fused_featurize(params, audio[:1], starts, interpret=True))
    assert out3.shape == (3, 16, 96)
    np.testing.assert_allclose(out3[:1], out1, atol=1e-5)
