"""Rational-quadratic spline transforms (Durkan et al., NeurIPS 2019).

JAX re-implementation of the monotone RQ spline used by the reference's
neural-spline flow layers (reference: archs/flow_layers/neural_spline.py).
Branch-free (where-based) so forward and inverse jit cleanly; the inverse
solves the per-bin quadratic in closed form.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted_vec(bin_locations: jnp.ndarray, inputs: jnp.ndarray) -> jnp.ndarray:
    """Per-element bin index: bins along the last axis of bin_locations."""
    return jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotone RQ spline on [left, right] -> [bottom, top].

    ``unnormalized_*`` have a trailing K (num_bins) / K+1 (derivatives) axis
    broadcastable against ``inputs``. Returns (outputs, logabsdet).
    """
    # broadcast shared (lower-rank) params up to the inputs' rank so the
    # take_along_axis gathers work for the documented broadcast contract
    def _up(p):
        extra = inputs.ndim + 1 - p.ndim
        return p.reshape((1,) * extra + p.shape) if extra > 0 else p

    unnormalized_widths = jnp.broadcast_to(
        _up(unnormalized_widths), inputs.shape + unnormalized_widths.shape[-1:])
    unnormalized_heights = jnp.broadcast_to(
        _up(unnormalized_heights), inputs.shape + unnormalized_heights.shape[-1:])
    unnormalized_derivatives = jnp.broadcast_to(
        _up(unnormalized_derivatives),
        inputs.shape + unnormalized_derivatives.shape[-1:])

    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_locations = cumheights if inverse else cumwidths
    bin_idx = jnp.clip(_searchsorted_vec(bin_locations, inputs), 0, num_bins - 1)

    take = lambda arr: jnp.take_along_axis(arr, bin_idx[..., None], axis=-1)[..., 0]
    input_cumwidths = take(cumwidths)
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights)
    input_heights = take(heights)
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives)
    input_derivatives_p1 = take(derivatives[..., 1:])

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)
        discriminant = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths

        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + (
            (input_derivatives + input_derivatives_p1 - 2 * input_delta)
            * theta_one_minus_theta
        )
        derivative_numerator = input_delta**2 * (
            input_derivatives_p1 * root**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(derivative_numerator) - 2 * jnp.log(denominator))
        return outputs, logabsdet

    theta = (inputs - input_cumwidths) / input_bin_widths
    theta_one_minus_theta = theta * (1 - theta)
    numerator = input_heights * (
        input_delta * theta**2 + input_derivatives * theta_one_minus_theta
    )
    denominator = input_delta + (
        (input_derivatives + input_derivatives_p1 - 2 * input_delta)
        * theta_one_minus_theta
    )
    outputs = input_cumheights + numerator / denominator
    derivative_numerator = input_delta**2 * (
        input_derivatives_p1 * theta**2
        + 2 * input_delta * theta_one_minus_theta
        + input_derivatives * (1 - theta) ** 2
    )
    logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tails: str = "linear",
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Identity outside [-tail_bound, tail_bound], RQ spline inside."""
    if tails != "linear":
        raise NotImplementedError(tails)
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # Pad derivative edges so the spline meets the identity tails smoothly.
    constant = float(jnp.log(jnp.expm1(1 - min_derivative)))
    pad_shape = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives, pad_shape, constant_values=constant
    )

    safe_inputs = jnp.clip(inputs, -tail_bound, tail_bound)
    outputs_in, logabsdet_in = rational_quadratic_spline(
        safe_inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound, right=tail_bound, bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, outputs_in, inputs)
    logabsdet = jnp.where(inside, logabsdet_in, 0.0)
    return outputs, logabsdet
