"""
Piecewise rational-quadratic spline transforms (JAX).

Math parity with reference ``piper/transforms.py`` (the neural-spline-flows
formulation with linear tails): monotonic rational-quadratic splines inside
[-tail_bound, tail_bound], identity outside. Fully vectorized over
(batch, channels, time, bins) — the bin search is a comparison-sum instead of
a sequential searchsorted, which vectorizes cleanly on the VPU.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["rational_quadratic_spline"]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jax.Array, jax.Array]:
    """
    Args:
        inputs: (...,) values to transform.
        unnormalized_widths/heights: (..., num_bins).
        unnormalized_derivatives: (..., num_bins - 1) interior derivatives.

    Returns (outputs, logabsdet), identity outside the tail bound.
    """
    num_bins = unnormalized_widths.shape[-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # Linear tails: boundary derivatives pinned to 1.
    constant = math.log(math.exp(1.0 - min_derivative) - 1.0)
    pad_shape = unnormalized_derivatives.shape[:-1] + (1,)
    pad = jnp.full(pad_shape, constant, unnormalized_derivatives.dtype)
    unnormalized_derivatives = jnp.concatenate([pad, unnormalized_derivatives, pad], axis=-1)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1.0 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2.0 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1.0 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2.0 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # Clamp for the bin search so outside-tail inputs index bin 0 harmlessly.
    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    bins = cumheights if inverse else cumwidths
    bin_idx = jnp.sum((clamped[..., None] >= bins[..., 1:-1]).astype(jnp.int32), axis=-1)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def take(arr: jax.Array) -> jax.Array:
        return jnp.take_along_axis(arr, bin_idx, axis=-1)[..., 0]

    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    input_heights = take(heights)
    delta = input_heights / input_bin_widths
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_plus_one = take(derivatives[..., 1:])

    if inverse:
        y = clamped - input_cumheights
        a = input_heights * (delta - input_derivatives) + y * (
            input_derivatives + input_derivatives_plus_one - 2.0 * delta
        )
        b = input_heights * input_derivatives - y * (
            input_derivatives + input_derivatives_plus_one - 2.0 * delta
        )
        c = -delta * y
        discriminant = b * b - 4.0 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths

        theta_one_minus_theta = root * (1.0 - root)
        denominator = delta + (
            (input_derivatives + input_derivatives_plus_one - 2.0 * delta)
            * theta_one_minus_theta
        )
        derivative_numerator = delta * delta * (
            input_derivatives_plus_one * root * root
            + 2.0 * delta * theta_one_minus_theta
            + input_derivatives * (1.0 - root) ** 2
        )
        logabsdet = -(jnp.log(derivative_numerator + 1e-12) - 2.0 * jnp.log(denominator + 1e-12))
    else:
        theta = (clamped - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1.0 - theta)
        numerator = input_heights * (delta * theta * theta + input_derivatives * theta_one_minus_theta)
        denominator = delta + (
            (input_derivatives + input_derivatives_plus_one - 2.0 * delta)
            * theta_one_minus_theta
        )
        outputs = input_cumheights + numerator / denominator

        derivative_numerator = delta * delta * (
            input_derivatives_plus_one * theta * theta
            + 2.0 * delta * theta_one_minus_theta
            + input_derivatives * (1.0 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator + 1e-12) - 2.0 * jnp.log(denominator + 1e-12)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet
