"""Hermite cubic splines with backward differences.

The recommended interpolation for Neural CDEs (reference README.md:119,175-177):
kink-free — so adaptive solvers take large steps — while remaining
"kind-of causal".  Capability parity with
/root/reference/torchcde/interpolation_hermite_cubic_bdiff.py.

Construction: on each knot interval the spline is the cubic Hermite
interpolant matching the two endpoint values and prescribed endpoint slopes,
where the slope at knot i is the *backward* finite difference
(x_i - x_{i-1}) / (t_i - t_{i-1}) — only past data, hence the causality
property.  The first knot has no past, so it borrows the first interval's
forward difference.  Converting the Hermite form to monomials in
tau = t - t_i with h = t_{i+1} - t_i, slopes m, and secant
S = (x_{i+1} - x_i) / h gives

    p(tau) = x_i + m_i tau + (3S - 2m_i - m_{i+1})/h tau^2
                 + (m_i + m_{i+1} - 2S)/h^2 tau^3,

stored in the (a, b, 2c, 3d) layout CubicSpline evaluates.
"""

import jax.numpy as jnp

from ..utils.misc import validate_input_path
from .linear import linear_interpolation_coeffs


def hermite_cubic_coefficients_with_backward_differences(x, t=None):
    """Hermite-cubic-with-backward-differences coefficients (capability of
    reference interpolation_hermite_cubic_bdiff.py:23-44).

    Arguments as ``linear_interpolation_coeffs`` (NaN infill included).
    Returns an array of shape (..., length - 1, 4 * channels), to be passed to
    ``CubicSpline``.
    """
    filled = linear_interpolation_coeffs(x, t=t, rectilinear=None)
    t = validate_input_path(filled, t)

    h = (t[1:] - t[:-1])[..., None]
    secant = (filled[..., 1:, :] - filled[..., :-1, :]) / h
    # Slope at knot i = secant of the interval ENDING at i; the first knot
    # reuses the first secant (no past to difference against).
    slope_start = jnp.concatenate([secant[..., :1, :], secant[..., :-1, :]], axis=-2)
    slope_end = secant

    a = filled[..., :-1, :]
    b = slope_start
    two_c = 2 * (3 * secant - 2 * slope_start - slope_end) / h
    three_d = 3 * (slope_start + slope_end - 2 * secant) / h**2
    return jnp.concatenate([a, b, two_c, three_d], axis=-1)
