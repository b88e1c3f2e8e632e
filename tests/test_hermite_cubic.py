"""Hermite-cubic-with-backward-differences tests.

Port of /root/reference/test/test_hermite_cubic.py: the produced spline must
match an independently-derived unit-time Hermite construction.
"""

import jax.numpy as jnp
import numpy as np

from torchcde_tpu import CubicSpline, hermite_cubic_coefficients_with_backward_differences

rng = np.random.default_rng(3)


class _HermiteUnitTime:
    def __init__(self, data):
        x_next = data[..., 1:, :]
        x_prev = data[..., :-1, :]
        derivs_next = x_next - x_prev
        derivs_prev = np.concatenate([derivs_next[..., :1, :], derivs_next[..., :-1, :]], axis=-2)
        self._a = x_prev
        self._b = derivs_prev
        self._two_c = 2 * 2 * (derivs_next - derivs_prev)
        self._three_d = -3 * (derivs_next - derivs_prev)

    def evaluate(self, fractional_part, index):
        fractional_part = np.asarray(fractional_part)[..., None]
        inner = 0.5 * self._two_c[..., index, :] + self._three_d[..., index, :] * fractional_part / 3
        inner = self._b[..., index, :] + inner * fractional_part
        return self._a[..., index, :] + inner * fractional_part


def test_hermite_cubic_unit_time():
    for num_channels in (1, 3, 6):
        for batch_dims in ((1,), (2, 3)):
            for length in (2, 5, 10):
                data = rng.standard_normal((*batch_dims, length, num_channels))
                hermite_coeffs = hermite_cubic_coefficients_with_backward_differences(
                    jnp.asarray(data)
                )
                spline = CubicSpline(hermite_coeffs)
                oracle = _HermiteUnitTime(data)
                for time in np.linspace(0, length, 10):
                    fractional_part, index = spline._interpret_t(jnp.asarray(time))
                    ours = np.asarray(spline.evaluate(jnp.asarray(time)))
                    theirs = oracle.evaluate(np.asarray(fractional_part), int(index))
                    assert np.allclose(ours, theirs)
