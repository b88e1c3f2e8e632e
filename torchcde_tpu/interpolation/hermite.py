"""Hermite cubic splines with backward differences.

The recommended interpolation for Neural CDEs (reference README.md:119,175-177):
kink-free — so adaptive solvers take large steps — while remaining
"kind-of causal".  Mirrors
/root/reference/torchcde/interpolation_hermite_cubic_bdiff.py; the
construction is closed-form over knot differences and vectorizes directly.
"""

import jax.numpy as jnp

from ..utils.misc import validate_input_path
from .linear import linear_interpolation_coeffs


def _setup_hermite_cubic_coeffs_w_backward_differences(times, coeffs, derivs):
    """Compute backward Hermite from linear coeffs (reference :5-20)."""
    x_prev = coeffs[..., :-1, :]
    x_next = coeffs[..., 1:, :]
    # Let x_0 - x_{-1} := x_1 - x_0.
    derivs_prev = jnp.concatenate([derivs[..., :1, :], derivs[..., :-1, :]], axis=-2)
    derivs_next = derivs
    x_diff = x_next - x_prev
    t_diff = (times[1:] - times[:-1])[..., None]

    a = x_prev
    b = derivs_prev
    two_c = 2 * (3 * (x_diff / t_diff - b) - derivs_next + derivs_prev) / t_diff
    three_d = (1 / t_diff**2) * (derivs_next - b) - two_c / t_diff
    return jnp.concatenate([a, b, two_c, three_d], axis=-1)


def hermite_cubic_coefficients_with_backward_differences(x, t=None):
    """Hermite-cubic-with-backward-differences coefficients (reference :23-44).

    Arguments as ``linear_interpolation_coeffs``.  Returns an array of shape
    (..., length - 1, 4 * channels), to be passed to ``CubicSpline``.
    """
    coeffs = linear_interpolation_coeffs(x, t=t, rectilinear=None)
    t = validate_input_path(coeffs, t)
    derivs = (coeffs[..., 1:, :] - coeffs[..., :-1, :]) / (t[1:] - t[:-1])[..., None]
    return _setup_hermite_cubic_coeffs_w_backward_differences(t, coeffs, derivs)
