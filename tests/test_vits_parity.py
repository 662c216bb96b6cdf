"""VITS building blocks vs torch ground truth (validates checkpoint import math)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from heybuddy_tpu.models.vits import modules as m  # noqa: E402


def test_conv1d_matches_torch():
    tc = nn.Conv1d(6, 8, 5, padding=2, dilation=2)
    x = torch.randn(2, 6, 32)
    with torch.no_grad():
        expected = tc(x).numpy()
    p = {"w": jnp.asarray(tc.weight.detach().numpy()), "b": jnp.asarray(tc.bias.detach().numpy())}
    # torch Conv1d with dilation=2, padding=2, kernel 5 -> effective padding 4
    out = np.asarray(m.conv1d(p, jnp.asarray(x.numpy()), padding=2 * 2, dilation=2))
    # note: torch padding=2 with dilation=2 gives output length 28; replicate exactly:
    out_torch_pad = np.asarray(m.conv1d(p, jnp.asarray(x.numpy()), padding=2, dilation=2))
    np.testing.assert_allclose(out_torch_pad, expected, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    for (in_ch, out_ch, kernel, stride, padding) in [(8, 4, 16, 8, 4), (6, 3, 8, 4, 2), (4, 2, 3, 1, 1)]:
        tc = nn.ConvTranspose1d(in_ch, out_ch, kernel, stride=stride, padding=padding)
        x = torch.randn(2, in_ch, 20)
        with torch.no_grad():
            expected = tc(x).numpy()
        w = tc.weight.detach().numpy()  # (in, out, k)
        w_flipped = np.flip(np.transpose(w, (1, 0, 2)), axis=-1).copy()
        p = {"w": jnp.asarray(w_flipped), "b": jnp.asarray(tc.bias.detach().numpy())}
        out = np.asarray(m.conv_transpose1d(p, jnp.asarray(x.numpy()), stride=stride, padding=padding))
        assert out.shape == expected.shape
        np.testing.assert_allclose(out, expected, atol=1e-4)


def test_channel_layernorm_matches_torch():
    ln = nn.LayerNorm(12)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(12))
        ln.bias.copy_(torch.randn(12))
    x = torch.randn(2, 12, 9)
    # reference piper LayerNorm normalizes the channel axis by transposing
    with torch.no_grad():
        expected = ln(x.transpose(1, -1)).transpose(1, -1).numpy()
    p = {"g": jnp.asarray(ln.weight.detach().numpy()), "b": jnp.asarray(ln.bias.detach().numpy())}
    out = np.asarray(m.channel_layernorm(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_wn_gated_stack_matches_torch_reference():
    """Hand-built torch WN (VITS semantics) vs our wn()."""
    hidden, kernel, n_layers, gin = 4, 3, 2, 6
    torch.manual_seed(0)

    in_layers = [nn.Conv1d(hidden, 2 * hidden, kernel, padding=1) for _ in range(n_layers)]
    res_skip = [
        nn.Conv1d(hidden, 2 * hidden if i < n_layers - 1 else hidden, 1) for i in range(n_layers)
    ]
    cond = nn.Conv1d(gin, 2 * hidden * n_layers, 1)

    def torch_wn(x, mask, g):
        output = torch.zeros_like(x)
        g_all = cond(g)
        for i in range(n_layers):
            x_in = in_layers[i](x)
            g_l = g_all[:, i * 2 * hidden : (i + 1) * 2 * hidden]
            acts = torch.tanh((x_in + g_l)[:, :hidden]) * torch.sigmoid((x_in + g_l)[:, hidden:])
            rs = res_skip[i](acts)
            if i < n_layers - 1:
                x = (x + rs[:, :hidden]) * mask
                output = output + rs[:, hidden:]
            else:
                output = output + rs
        return output * mask

    x = torch.randn(2, hidden, 11)
    g = torch.randn(2, gin, 1)
    mask = torch.ones(2, 1, 11)
    with torch.no_grad():
        expected = torch_wn(x, mask, g).numpy()

    def conv_params(tc):
        return {"w": jnp.asarray(tc.weight.detach().numpy()), "b": jnp.asarray(tc.bias.detach().numpy())}

    params = {
        "in_layers": [conv_params(c) for c in in_layers],
        "res_skip_layers": [conv_params(c) for c in res_skip],
        "cond_layer": conv_params(cond),
        "kernel_size": m.Static(kernel),
        "dilation_rate": m.Static(1),
    }
    out = np.asarray(
        m.wn(params, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()), g=jnp.asarray(g.numpy()))
    )
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_residual_coupling_invertible():
    key = jax.random.PRNGKey(0)
    p = m.residual_coupling_layer_init(key, channels=8, hidden_channels=16, kernel_size=5,
                                       dilation_rate=1, n_layers=2, gin_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12))
    mask = jnp.ones((2, 1, 12))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 1))
    # post conv is zero-init; perturb so the flow is non-trivial
    p["post"]["w"] = 0.1 * jax.random.normal(jax.random.PRNGKey(3), p["post"]["w"].shape)
    forward = m.residual_coupling_layer(p, x, mask, g=g, reverse=False)
    recovered = m.residual_coupling_layer(p, forward, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(x), atol=1e-5)


def test_convflow_invertible():
    key = jax.random.PRNGKey(0)
    p = m.convflow_init(key, in_channels=2, filter_channels=8, kernel_size=3, n_layers=2)
    # non-zero spline projection so the transform is non-trivial
    p["proj"]["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(1), p["proj"]["w"].shape)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 10))
    mask = jnp.ones((2, 1, 10))
    y, logdet = m.convflow(p, x, mask, reverse=False)
    x_back, _ = m.convflow(p, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
    assert np.isfinite(np.asarray(logdet)).all()


def test_spline_identity_outside_tails():
    from heybuddy_tpu.models.vits.transforms import rational_quadratic_spline

    x = jnp.asarray([[-7.0, 7.0, 100.0]])
    uw = jnp.zeros((1, 3, 10))
    uh = jnp.zeros((1, 3, 10))
    ud = jnp.zeros((1, 3, 9))
    out, logdet = rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    np.testing.assert_allclose(np.asarray(logdet), 0.0)


def test_generate_path_monotonic():
    from heybuddy_tpu.models.vits.synthesizer import generate_path

    duration = jnp.asarray([[[2.0, 3.0, 1.0]]])  # (1,1,3) -> total 6 frames
    mask = jnp.ones((1, 1, 6, 3))
    path = np.asarray(generate_path(duration, mask))[0, 0]  # (6, 3)
    np.testing.assert_array_equal(path.sum(axis=1), np.ones(6))
    np.testing.assert_array_equal(path[:, 0], [1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(path[:, 1], [0, 0, 1, 1, 1, 0])
    np.testing.assert_array_equal(path[:, 2], [0, 0, 0, 0, 0, 1])


def test_duration_predictor_matches_torch():
    """Deterministic (non-SDP) duration predictor vs a torch build of the
    reference structure (reference piper/models.py:174-240)."""
    from heybuddy_tpu.models.vits.synthesizer import duration_predictor

    torch.manual_seed(0)
    in_ch, fc, kernel, gin = 12, 24, 3, 8
    conv_1 = nn.Conv1d(in_ch, fc, kernel, padding=kernel // 2)
    conv_2 = nn.Conv1d(fc, fc, kernel, padding=kernel // 2)
    proj = nn.Conv1d(fc, 1, 1)
    cond = nn.Conv1d(gin, in_ch, 1)
    g1, b1 = torch.randn(fc), torch.randn(fc)
    g2, b2 = torch.randn(fc), torch.randn(fc)

    x = torch.randn(2, in_ch, 11)
    g = torch.randn(2, gin, 1)
    mask = torch.ones(2, 1, 11)
    mask[1, :, 8:] = 0.0

    def ch_ln(t, gamma, beta):
        y = torch.nn.functional.layer_norm(t.transpose(1, -1), (t.shape[1],))
        return (y * gamma + beta).transpose(1, -1)

    with torch.no_grad():
        h = x + cond(g)
        h = ch_ln(torch.relu(conv_1(h * mask)), g1, b1)
        h = ch_ln(torch.relu(conv_2(h * mask)), g2, b2)
        expected = (proj(h * mask) * mask).numpy()

    def conv_params(c):
        return {"w": jnp.asarray(c.weight.detach().numpy()),
                "b": jnp.asarray(c.bias.detach().numpy())}

    p = {
        "conv_1": conv_params(conv_1),
        "norm_1": {"g": jnp.asarray(g1.numpy()), "b": jnp.asarray(b1.numpy())},
        "conv_2": conv_params(conv_2),
        "norm_2": {"g": jnp.asarray(g2.numpy()), "b": jnp.asarray(b2.numpy())},
        "proj": conv_params(proj),
        "cond": conv_params(cond),
    }
    out = np.asarray(duration_predictor(
        p, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()), jnp.asarray(g.numpy())
    ))
    np.testing.assert_allclose(out, expected, atol=1e-5)
