"""VITS training-side graph: posterior encoder, alignment, losses, gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.models.vits import VitsConfig, init_params
from heybuddy_tpu.models.vits.training import (
    posterior_encoder,
    posterior_encoder_init,
    rand_slice_segments,
    training_forward,
)

TINY = VitsConfig(
    n_speakers=4, gin_channels=16, n_layers=1, hidden_channels=64,
    filter_channels=128, inter_channels=64, upsample_initial_channel=64,
)


def _tiny_setup():
    params = init_params(jax.random.PRNGKey(0), TINY)
    post = posterior_encoder_init(
        jax.random.PRNGKey(1), in_channels=65, out_channels=TINY.inter_channels,
        hidden_channels=TINY.hidden_channels, n_layers=2, gin_channels=TINY.gin_channels,
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 40, (2, 12)), jnp.int32)
    id_lengths = jnp.asarray([12, 8], jnp.int32)
    spec = jnp.asarray(rng.normal(0, 1, (2, 65, 40)).astype(np.float32))
    spec_lengths = jnp.asarray([40, 30], jnp.int32)
    spk = params["emb_g"][jnp.asarray([0, 1])]
    return params, post, ids, id_lengths, spec, spec_lengths, spk


def test_posterior_encoder_shapes():
    post = posterior_encoder_init(jax.random.PRNGKey(0), in_channels=65, out_channels=32,
                                  hidden_channels=48, n_layers=2, gin_channels=8)
    spec = jnp.asarray(np.random.default_rng(0).normal(size=(2, 65, 20)).astype(np.float32))
    lengths = jnp.asarray([20, 15], jnp.int32)
    g = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 1)).astype(np.float32))
    z, m_q, logs_q, mask = posterior_encoder(post, jax.random.PRNGKey(2), spec, lengths, g)
    assert z.shape == (2, 32, 20)
    assert mask.shape == (2, 1, 20)
    # masked positions are zero
    assert np.allclose(np.asarray(z)[1, :, 15:], 0.0)


def test_rand_slice_segments():
    x = jnp.asarray(np.arange(2 * 3 * 20, dtype=np.float32).reshape(2, 3, 20))
    lengths = jnp.asarray([20, 12], jnp.int32)
    segments, starts = rand_slice_segments(jax.random.PRNGKey(0), x, lengths, 8)
    assert segments.shape == (2, 3, 8)
    starts_np = np.asarray(starts)
    assert (starts_np >= 0).all() and (starts_np + 8 <= np.asarray(lengths)).all()


def test_training_forward_losses_and_alignment():
    params, post, ids, id_lengths, spec, spec_lengths, spk = _tiny_setup()
    fwd = jax.jit(functools.partial(training_forward, segment_size=8, config=TINY))
    out = fwd(params, post, jax.random.PRNGKey(3), ids, id_lengths, spec, spec_lengths, spk)
    assert out["audio_segment"].shape == (2, 8 * TINY.hop_samples)
    assert np.isfinite(float(out["kl_loss"]))
    assert np.isfinite(float(out["duration_loss"]))
    attn = np.asarray(out["attn"])  # (b, t_y, t_x)
    # valid region: each mel frame of sample 0 assigned to exactly one token
    np.testing.assert_allclose(attn[0].sum(axis=1), 1.0)
    tokens = attn[0].argmax(axis=1)
    assert (np.diff(tokens) >= 0).all()


def test_training_forward_differentiable():
    params, post, ids, id_lengths, spec, spec_lengths, spk = _tiny_setup()

    def loss_fn(p, q):
        out = training_forward(
            p, q, jax.random.PRNGKey(3), ids, id_lengths, spec, spec_lengths, spk,
            segment_size=8, config=TINY,
        )
        return out["kl_loss"] + out["duration_loss"] + jnp.mean(jnp.square(out["audio_segment"]))

    grads = jax.grad(loss_fn, argnums=(0, 1))(params, post)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    total = sum(float(np.abs(np.asarray(leaf)).sum()) for leaf in leaves)
    assert total > 0.0


def test_sdp_forward_nll_finite_and_differentiable():
    import jax.numpy as jnp
    from heybuddy_tpu.models.vits.training import sdp_posterior_init, stochastic_duration_nll

    params = init_params(jax.random.PRNGKey(0), TINY)
    post = sdp_posterior_init(jax.random.PRNGKey(5), filter_channels=TINY.hidden_channels)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(2, TINY.hidden_channels, 10)).astype(np.float32))
    x_mask = jnp.ones((2, 1, 10))
    durations = jnp.asarray(rng.integers(1, 6, (2, 1, 10)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, TINY.gin_channels, 1)).astype(np.float32))

    def loss_fn(dp, q):
        p = dict(params); p_dp = dict(params["dp"]); p_dp.update(dp)
        nll = stochastic_duration_nll(p_dp, q, jax.random.PRNGKey(1), h, x_mask, durations, g)
        return jnp.mean(nll)

    loss = loss_fn(params["dp"], post)
    assert np.isfinite(float(loss))
    grads = jax.grad(loss_fn, argnums=(0, 1))(params["dp"], post)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0


def test_training_forward_with_sdp_nll():
    from heybuddy_tpu.models.vits.training import sdp_posterior_init

    params, post, ids, id_lengths, spec, spec_lengths, spk = _tiny_setup()
    sdp_post = sdp_posterior_init(jax.random.PRNGKey(9), filter_channels=TINY.hidden_channels)
    out = training_forward(
        params, post, jax.random.PRNGKey(3), ids, id_lengths, spec, spec_lengths, spk,
        segment_size=8, config=TINY, sdp_posterior_params=sdp_post,
    )
    assert np.isfinite(float(out["duration_loss"]))


def test_training_forward_non_sdp_duration_grads():
    """use_sdp=False layout: duration loss trains the deterministic predictor."""
    cfg = TINY._replace(use_sdp=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "conv_1" in params["dp"]
    post = posterior_encoder_init(
        jax.random.PRNGKey(1), in_channels=65, out_channels=cfg.inter_channels,
        hidden_channels=cfg.hidden_channels, n_layers=2, gin_channels=cfg.gin_channels,
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 40, (2, 12)), jnp.int32)
    id_lengths = jnp.asarray([12, 8], jnp.int32)
    spec = jnp.asarray(rng.normal(0, 1, (2, 65, 40)).astype(np.float32))
    spec_lengths = jnp.asarray([40, 30], jnp.int32)
    spk = params["emb_g"][jnp.asarray([0, 1])]

    def loss_fn(p):
        out = training_forward(
            p, post, jax.random.PRNGKey(3), ids, id_lengths, spec, spec_lengths, spk,
            segment_size=8, config=cfg,
        )
        return out["duration_loss"]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    g1 = np.asarray(grads["dp"]["conv_1"]["w"])
    assert np.isfinite(g1).all() and np.abs(g1).sum() > 0
    # inputs are detached: no duration gradient may leak into the text encoder
    enc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(np.asarray(b)).sum()), grads["enc_p"], 0.0
    )
    assert enc_grad == 0.0
