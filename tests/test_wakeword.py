"""Wake-word classifier architecture, persistence, and torch import parity."""

import numpy as np
import pytest

from heybuddy_tpu.models.wakeword import (
    WakeWordMLPModel,
    WakeWordTransformerModel,
    get_normalized_dim,
    load_model,
)


def test_normalized_dim_convention():
    # Golden values from reference util/modeling_util.py doctests.
    assert get_normalized_dim(76, 32) == 64
    assert get_normalized_dim(100, 32) == 96
    assert get_normalized_dim(106, 32) == 96
    assert get_normalized_dim(146, 32) == 128
    assert get_normalized_dim(96) == 64


def test_mlp_output_contract():
    model = WakeWordMLPModel()
    x = np.random.default_rng(0).normal(size=(4, 16, 96)).astype(np.float32)
    out = np.asarray(model(x))
    assert out.shape == (4, 1)
    assert (out > 0).all() and (out < 1).all()


def test_mlp_half_layers():
    model = WakeWordMLPModel(use_half_layers=True)
    assert len(model.half_indices) == 16
    x = np.random.default_rng(1).normal(size=(2, 16, 96)).astype(np.float32)
    assert np.asarray(model(x)).shape == (2, 1)


def test_transformer_output_contract():
    model = WakeWordTransformerModel()
    x = np.random.default_rng(2).normal(size=(3, 16, 96)).astype(np.float32)
    out = np.asarray(model(x))
    assert out.shape == (3, 1)
    assert (out >= 0).all() and (out <= 1).all()


@pytest.mark.parametrize("arch_kwargs", [
    {},
    {"num_layers": 0},
    {"use_half_layers": True},
    {"use_gating": False},
])
def test_mlp_save_load_roundtrip(tmp_path, arch_kwargs):
    model = WakeWordMLPModel(**arch_kwargs)
    path = str(tmp_path / "model.npz")
    model.save(path)
    loaded = load_model(path)
    x = np.random.default_rng(3).normal(size=(2, 16, 96)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(loaded(x)), atol=1e-6)


def test_transformer_save_load_roundtrip(tmp_path):
    model = WakeWordTransformerModel(num_layers=1)
    path = str(tmp_path / "transformer.npz")
    model.save(path)
    loaded = load_model(path)
    x = np.random.default_rng(4).normal(size=(2, 16, 96)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(loaded(x)), atol=1e-6)


def test_torch_checkpoint_import_parity(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    hidden = get_normalized_dim(96)

    class TorchGatedMLP(nn.Module):
        def __init__(self, i, h, o):
            super().__init__()
            self.hidden = nn.Linear(i, h)
            self.gate = nn.Linear(i, h)
            self.output = nn.Linear(h, o)

        def forward(self, x):
            return self.output(nn.functional.silu(self.hidden(x)) * self.gate(x))

    class TorchRef(nn.Module):
        """Mirror of reference WakeWordMLPModel's state-dict layout + forward."""

        def __init__(self):
            super().__init__()
            self.norm_in = nn.LayerNorm(1536)
            self.mlp_in = TorchGatedMLP(1536, hidden, 96)
            self.layers = nn.ModuleList(
                [nn.Sequential(nn.LayerNorm(96), TorchGatedMLP(96, hidden, 96)) for _ in range(2)]
            )
            self.norm_out = nn.LayerNorm(96)
            self.mlp_out = TorchGatedMLP(96, hidden, 1)

        def forward(self, x):
            states = self.mlp_in(self.norm_in(x.flatten(1)))
            for layer in self.layers:
                states = layer(states)
            return torch.sigmoid(self.mlp_out(self.norm_out(states)))

    tm = TorchRef().eval()
    path = str(tmp_path / "ref.pt")
    torch.save(tm.state_dict(), path)
    jm = WakeWordMLPModel.from_torch_file(path)

    x = np.random.default_rng(5).normal(size=(8, 16, 96)).astype(np.float32)
    with torch.no_grad():
        torch_out = tm(torch.from_numpy(x)).numpy()
    jax_out = np.asarray(jm(x))
    np.testing.assert_allclose(torch_out, jax_out, atol=2e-3)
