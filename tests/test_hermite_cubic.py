"""Hermite-cubic-with-backward-differences tests.

Contract (reference test/test_hermite_cubic.py): on unit-spaced knots the
produced spline is the cubic Hermite interpolant whose knot slopes are
backward differences.  The oracle here is derived independently of the
implementation: it evaluates the four Hermite BASIS polynomials

    h00(s) = 2s^3 - 3s^2 + 1      h01(s) = -2s^3 + 3s^2
    h10(s) =  s^3 - 2s^2 + s      h11(s) =  s^3 - s^2

and combines p(s) = h00 x_i + h10 m_i + h01 x_{i+1} + h11 m_{i+1} with
m_i = x_i - x_{i-1} (m_0 = x_1 - x_0), plus the corresponding derivative
basis — no shared coefficient algebra with the package.
"""

import jax.numpy as jnp
import numpy as np

from torchcde_tpu import CubicSpline, hermite_cubic_coefficients_with_backward_differences

rng = np.random.default_rng(3)


def _hermite_basis(s):
    s2, s3 = s * s, s * s * s
    return 2 * s3 - 3 * s2 + 1, s3 - 2 * s2 + s, -2 * s3 + 3 * s2, s3 - s2


def _hermite_basis_deriv(s):
    s2 = s * s
    return 6 * s2 - 6 * s, 3 * s2 - 4 * s + 1, -6 * s2 + 6 * s, 3 * s2 - 2 * s


def _oracle(data, time):
    """Evaluate (value, derivative) of the backward-difference Hermite spline
    at scalar `time` on unit-spaced knots 0..length-1, via basis polynomials."""
    length = data.shape[-2]
    i = int(np.clip(np.floor(time), 0, length - 2))
    s = time - i
    m = np.diff(data, axis=-2)
    m = np.concatenate([m[..., :1, :], m], axis=-2)  # slope at knot j = m[j]
    pieces = (data[..., i, :], m[..., i, :], data[..., i + 1, :], m[..., i + 1, :])
    val = sum(h * p for h, p in zip(_hermite_basis(s), pieces))
    der = sum(h * p for h, p in zip(_hermite_basis_deriv(s), pieces))
    return val, der


def test_matches_hermite_basis_oracle():
    for num_channels in (1, 3, 6):
        for batch_dims in ((1,), (2, 3)):
            for length in (2, 5, 10):
                data = rng.standard_normal((*batch_dims, length, num_channels))
                spline = CubicSpline(
                    hermite_cubic_coefficients_with_backward_differences(
                        jnp.asarray(data)
                    )
                )
                for time in rng.uniform(0, length - 1, size=4):
                    val, der = _oracle(data, time)
                    np.testing.assert_allclose(
                        np.asarray(spline.evaluate(jnp.asarray(time))), val, atol=1e-9
                    )
                    np.testing.assert_allclose(
                        np.asarray(spline.derivative(jnp.asarray(time))), der, atol=1e-9
                    )


def test_knot_interpolation_and_slopes():
    # The spline passes through every knot, and its one-sided derivative at
    # the START of interval i equals the backward difference at knot i.
    data = rng.standard_normal((4, 8, 2))
    spline = CubicSpline(
        hermite_cubic_coefficients_with_backward_differences(jnp.asarray(data))
    )
    for j in range(8):
        np.testing.assert_allclose(
            np.asarray(spline.evaluate(jnp.asarray(float(j)))), data[..., j, :],
            atol=1e-9,
        )
    for j in range(1, 7):
        bdiff = data[..., j, :] - data[..., j - 1, :]
        np.testing.assert_allclose(
            np.asarray(spline.derivative(jnp.asarray(float(j)))), bdiff, atol=1e-9
        )


def test_irregular_times():
    # Non-uniform knot spacing: values and slopes still interpolate.
    t = np.asarray([0.0, 0.4, 1.7, 2.0, 5.5])
    data = rng.standard_normal((3, 5, 2))
    spline = CubicSpline(
        hermite_cubic_coefficients_with_backward_differences(
            jnp.asarray(data), t=jnp.asarray(t)
        ),
        t=jnp.asarray(t),
    )
    for j, tj in enumerate(t):
        np.testing.assert_allclose(
            np.asarray(spline.evaluate(jnp.asarray(tj))), data[..., j, :], atol=1e-8
        )
    for j in range(1, 4):
        bdiff = (data[..., j, :] - data[..., j - 1, :]) / (t[j] - t[j - 1])
        np.testing.assert_allclose(
            np.asarray(spline.derivative(jnp.asarray(t[j]))), bdiff, atol=1e-8
        )
