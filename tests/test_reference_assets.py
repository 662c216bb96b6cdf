"""
Parity tests against the reference's REAL shipped artifacts.

The reference repo ships its trained wake-word head models as ONNX files
(reference src/ts/models/*.onnx, served by the browser runtime
src/ts/models/wake-word.ts:10-100). These are the first genuine reference
artifacts reachable offline, so they anchor the hand-rolled ONNX wire-format
parser (export/onnx_proto.py) and the ONNX->JAX importer (export/onnx_to_jax.py)
against files we did not produce ourselves.

Skipped automatically when the reference checkout is absent.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

REFERENCE_MODELS = sorted(glob.glob("/root/reference/src/ts/models/*.onnx"))

pytestmark = pytest.mark.skipif(
    not REFERENCE_MODELS, reason="reference ONNX artifacts not available"
)


@pytest.fixture(scope="module")
def hey_buddy_fn():
    from heybuddy_tpu.export.onnx_to_jax import OnnxJaxFunction

    return OnnxJaxFunction.from_file("/root/reference/src/ts/models/hey-buddy.onnx")


def test_reference_head_contract(hey_buddy_fn):
    """Deployment contract: input "input" [1,16,96] -> output "output" [1,1]
    (reference wakeword.py:325-332, browser models/wake-word.ts)."""
    assert hey_buddy_fn.input_names == ["input"]
    assert hey_buddy_fn.output_names == ["output"]
    inp = hey_buddy_fn.graph.inputs[0]
    out = hey_buddy_fn.graph.outputs[0]
    assert tuple(inp.shape) == (1, 16, 96)
    assert tuple(out.shape) == (1, 1)


def test_reference_head_architecture(hey_buddy_fn):
    """The shipped heads are the reference's gated-MLP wake-word model:
    Flatten -> [LayerNormalization, Gemm x2 (gate), Sigmoid, Mul] blocks with
    half-layer sigmoid taps, ending in a Gemm+Sigmoid scorer."""
    ops = {}
    for n in hey_buddy_fn.graph.nodes:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert ops.get("Flatten") == 1
    assert ops.get("Gemm", 0) >= 4
    assert ops.get("Sigmoid", 0) >= 1
    # nothing in the graph falls outside the importer's op set (execution
    # below would raise otherwise; this documents the surface)
    assert set(ops) <= {"Flatten", "LayerNormalization", "Gemm", "Sigmoid", "Mul"}


@pytest.mark.parametrize("path", REFERENCE_MODELS, ids=lambda p: os.path.basename(p))
def test_all_reference_heads_execute(path):
    """Every shipped reference head parses and executes via the importer,
    returns a probability, and is deterministic."""
    from heybuddy_tpu.export.onnx_to_jax import OnnxJaxFunction

    fn = OnnxJaxFunction.from_file(path)
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, (1, 16, 96)).astype(np.float32)
    out1 = np.asarray(fn(fn.params, x))
    out2 = np.asarray(fn(fn.params, x))
    assert out1.shape == (1, 1)
    assert 0.0 <= float(out1[0, 0]) <= 1.0
    np.testing.assert_array_equal(out1, out2)
    # noise and silence are not the wake phrase in ANY embedding space; the
    # trained reference heads agree (sanity that the math is not degenerate)
    zero = np.asarray(fn(fn.params, np.zeros((1, 16, 96), np.float32)))
    assert float(zero[0, 0]) < 0.5


def test_reference_head_jits(hey_buddy_fn):
    """The imported graph is jittable (static shapes end-to-end)."""
    import jax

    jitted = jax.jit(hey_buddy_fn)
    x = np.random.default_rng(1).normal(0.0, 1.0, (1, 16, 96)).astype(np.float32)
    out = np.asarray(jitted(hey_buddy_fn.params, x))
    eager = np.asarray(hey_buddy_fn(hey_buddy_fn.params, x))
    np.testing.assert_allclose(out, eager, rtol=1e-5, atol=1e-6)
