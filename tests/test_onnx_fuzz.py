"""Exporter <-> converter cross-check (VERDICT r2 next #6).

The ONNX *converter* (export/onnx_to_jax.py) is anchored against torch by
tests/test_onnx_to_jax.py; the *exporter* (export/onnx_export.py) was only
ever validated against in-repo evaluators. Round-tripping randomized
architectures exporter -> file -> converter -> compare-with-native-JAX
transitively anchors the exporter to the torch-verified implementation
(reference deployment contract: wakeword.py:325-332).
"""

import os

import numpy as np
import pytest

from heybuddy_tpu.export.onnx_export import export_mlp_model
from heybuddy_tpu.export.onnx_to_jax import load_onnx_function
from heybuddy_tpu.models.wakeword import WakeWordMLPModel


def _run(fn, x):
    """Single-output graphs return the array directly; normalize."""
    res = fn(fn.params, x)
    return np.asarray(res[0] if isinstance(res, (list, tuple)) else res)


def _random_arch(rng):
    return dict(
        layer_dim=int(rng.choice([32, 64, 96, 128])),
        num_layers=int(rng.integers(1, 4)),
        use_gating=bool(rng.integers(0, 2)),
        use_half_layers=bool(rng.integers(0, 2)),
        activation=str(rng.choice(["silu", "relu", "gelu"])),
        seed=int(rng.integers(0, 10_000)),
    )


@pytest.mark.slow
def test_exporter_converter_roundtrip_fuzz(tmp_path):
    rng = np.random.default_rng(0)
    for trial in range(20):
        arch = _random_arch(rng)
        model = WakeWordMLPModel(**arch)
        path = str(tmp_path / f"fuzz{trial}.onnx")
        export_mlp_model(model, path)
        fn = load_onnx_function(path)

        x = rng.normal(0, 1, (1, 16, 96)).astype(np.float32)
        native = np.asarray(model(x)).reshape(-1)
        via_onnx = _run(fn, x).reshape(-1)
        np.testing.assert_allclose(
            via_onnx, native, atol=2e-5, rtol=1e-4,
            err_msg=f"arch={arch}",
        )


def test_exporter_converter_roundtrip_batch_of_inputs(tmp_path):
    """One architecture, many inputs: catches input-dependent divergence
    (e.g. activation branches) that a single probe could miss."""
    rng = np.random.default_rng(1)
    model = WakeWordMLPModel(layer_dim=64, num_layers=2, activation="relu", seed=3)
    path = str(tmp_path / "probe.onnx")
    export_mlp_model(model, path)
    fn = load_onnx_function(path)
    for scale in (0.01, 1.0, 100.0):
        x = (rng.normal(0, scale, (1, 16, 96))).astype(np.float32)
        native = np.asarray(model(x)).reshape(-1)
        via_onnx = _run(fn, x).reshape(-1)
        np.testing.assert_allclose(via_onnx, native, atol=3e-5, rtol=1e-3)


def test_bundled_browser_head_golden():
    """The exact shipped browser wake-word head loads through the converter
    and produces scores in [0, 1] with the deployment I/O contract
    (input [1,16,96] -> output [1,1])."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "browser", "models", "hey-buddy.onnx",
    )
    if not os.path.exists(path):
        pytest.skip("bundled browser head not present")
    fn = load_onnx_function(path)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 16, 96)).astype(np.float32)
    out = _run(fn, x)
    assert out.shape == (1, 1)
    assert 0.0 <= float(out) <= 1.0
