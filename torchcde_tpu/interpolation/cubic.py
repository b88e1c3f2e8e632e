"""Natural cubic splines, TPU-first.

Capability parity with /root/reference/torchcde/interpolation_cubic.py.  Two
deliberate departures from the reference's *implementation* (behavior is
preserved):

* The tridiagonal solve is a batched kernel (Thomas scan / parallel cyclic
  reduction — see ``ops.tridiagonal``) instead of a Python loop over length
  (reference misc.py:58-65).

* Missing-value handling (reference interpolation_cubic.py:56-167: per-scalar
  Python recursion + per-interval re-normalisation loop) is one fully batched
  masked pipeline: (1) endpoint imputation per version, (2) stable-argsort
  compaction of observed knots to the front with identity padding rows in the
  tridiagonal system, (3) the same spline algebra on the compacted knots, and
  (4) vectorized polynomial re-basing of each observed-knot polynomial onto
  every full-grid interval (the cumsum-of-observed trick replaces the
  reference's sequential two-iterator walk at interpolation_cubic.py:147-162).
  Everything is jittable with static shapes; per-channel observation counts
  are data, not shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tridiagonal import tridiagonal_solve
from ..utils.misc import is_concrete, validate_input_path
from .base import InterpolationBase, register_control


def _spline_algebra(x, kd, hr, six_pd_hr):
    """Shared coefficient algebra (reference interpolation_cubic.py:44-51).

    x: knot values (..., k); kd: knot derivatives (..., k); hr: reciprocal
    knot spacings (..., k - 1) (zero ⇒ masked interval); six_pd_hr is
    6 * (x[i+1] - x[i]) * hr.
    Returns (a, b, two_c, three_d), each (..., k - 1).
    """
    a = x[..., :-1]
    b = kd[..., :-1]
    two_c = (six_pd_hr - 4 * kd[..., :-1] - 2 * kd[..., 1:]) * hr
    three_d = (-six_pd_hr + 3 * (kd[..., :-1] + kd[..., 1:])) * hr * hr
    return a, b, two_c, three_d


def _natural_cubic_coeffs_dense(t, x):
    """No-missing-values natural spline on (..., length), length last.

    Matches _natural_cubic_spline_coeffs_without_missing_values
    (interpolation_cubic.py:7-53); the length == 2 case needs no special
    branch here because the general tridiagonal system already degenerates to
    the straight line.
    """
    h = t[1:] - t[:-1]
    hr = 1.0 / h
    six_pd = 6 * (x[..., 1:] - x[..., :-1])
    six_pd_hr = six_pd * hr
    pds = 0.5 * six_pd_hr * hr  # = 3 * path_diffs * hr^2

    zeros_off = jnp.zeros(hr.shape[:-1] + (1,), dtype=x.dtype)
    hr_padded_left = jnp.concatenate([zeros_off, jnp.broadcast_to(hr, hr.shape)], axis=-1)
    hr_padded_right = jnp.concatenate([jnp.broadcast_to(hr, hr.shape), zeros_off], axis=-1)
    diag = 2 * (hr_padded_left + hr_padded_right)

    z = jnp.zeros(pds.shape[:-1] + (1,), dtype=x.dtype)
    rhs = jnp.concatenate([pds, z], axis=-1) + jnp.concatenate([z, pds], axis=-1)

    kd = tridiagonal_solve(rhs, hr, diag, hr)
    return _spline_algebra(x, kd, hr, six_pd_hr)


def _natural_cubic_coeffs_masked(t, x, _version):
    """NaN-aware natural spline on (..., length), length last, fully batched.

    Reproduces _natural_cubic_spline_coeffs_with_missing_values_scalar
    (interpolation_cubic.py:78-167) for every batch row and channel at once.
    """
    length = x.shape[-1]
    observed = ~jnp.isnan(x)
    any_obs = jnp.any(observed, axis=-1, keepdims=True)

    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    first_idx = jnp.argmax(observed, axis=-1)[..., None]
    last_idx = (length - 1) - jnp.argmax(jnp.flip(observed, axis=-1), axis=-1)[..., None]
    v_first = jnp.take_along_axis(x, first_idx, axis=-1)
    v_last = jnp.take_along_axis(x, last_idx, axis=-1)

    if _version == 0:
        # Impute only the very first/last entry (interpolation_cubic.py:101-118).
        x = jnp.where((pos == 0) & ~observed, v_first, x)
        x = jnp.where((pos == length - 1) & ~observed, v_last, x)
    else:
        # Fill forward/backward from the first/last observation
        # (interpolation_cubic.py:119-131); interior NaNs stay missing.
        x = jnp.where(pos < first_idx, v_first, x)
        x = jnp.where(pos > last_idx, v_last, x)

    observed = ~jnp.isnan(x)
    n_obs = jnp.sum(observed, axis=-1)[..., None]  # (..., 1)

    # Stable compaction: observed knots to the front, order preserved.
    order = jnp.argsort(~observed, axis=-1, stable=True)
    x_comp = jnp.take_along_axis(x, order, axis=-1)
    t_comp = jnp.take(t, order)
    genuine = pos < n_obs
    # Padded knots continue strictly increasing so every spacing is positive;
    # their equations are decoupled below, so the values are otherwise unused.
    t_comp = jnp.where(genuine, t_comp, t[-1] + (pos - n_obs + 1).astype(t.dtype))
    x_comp = jnp.where(genuine, x_comp, jnp.zeros_like(x_comp))

    h = t_comp[..., 1:] - t_comp[..., :-1]
    interval_valid = pos[..., :-1] < (n_obs - 1)
    hr = jnp.where(interval_valid, 1.0 / h, jnp.zeros_like(h))
    six_pd_hr = 6 * (x_comp[..., 1:] - x_comp[..., :-1]) * hr
    pds = 0.5 * six_pd_hr * hr

    z = jnp.zeros(hr.shape[:-1] + (1,), dtype=x.dtype)
    diag = 2 * (jnp.concatenate([z, hr], axis=-1) + jnp.concatenate([hr, z], axis=-1))
    diag = jnp.where(diag == 0, jnp.ones_like(diag), diag)  # identity rows for padding
    rhs = jnp.concatenate([pds, z], axis=-1) + jnp.concatenate([z, pds], axis=-1)

    kd = tridiagonal_solve(rhs, hr, diag, hr)
    a0, b0, two_c0, three_d0 = _spline_algebra(x_comp, kd, hr, six_pd_hr)

    # Re-base each observed-knot polynomial onto every full-grid interval
    # (vectorizes the walk at interpolation_cubic.py:147-162).  The compacted
    # index of the last observed knot at-or-before grid position j is simply
    # cumsum(observed)[j] - 1.
    k = jnp.cumsum(observed.astype(jnp.int32), axis=-1)[..., :-1] - 1
    k = jnp.clip(k, 0, length - 2)
    offset = jnp.take_along_axis(t_comp, k, axis=-1) - t[: length - 1]

    a_k = jnp.take_along_axis(a0, k, axis=-1)
    b_k = jnp.take_along_axis(b0, k, axis=-1)
    two_c_k = jnp.take_along_axis(two_c0, k, axis=-1)
    three_d_k = jnp.take_along_axis(three_d0, k, axis=-1)

    a = a_k + ((0.5 * two_c_k - three_d_k * offset / 3) * offset - b_k) * offset
    b = b_k + (three_d_k * offset - two_c_k) * offset
    two_c = two_c_k - 2 * three_d_k * offset
    three_d = three_d_k

    # All-NaN channels: constant zero path (interpolation_cubic.py:85-92).
    zero = jnp.zeros_like(a)
    return (
        jnp.where(any_obs, a, zero),
        jnp.where(any_obs, b, zero),
        jnp.where(any_obs, two_c, zero),
        jnp.where(any_obs, three_d, zero),
    )


def _natural_cubic_spline_coeffs(x, t, _version):
    x = jnp.asarray(x)
    t = validate_input_path(x, t)

    # Channels act as a batch dimension for fitting (interpolation_cubic.py:177).
    xT = jnp.swapaxes(x, -1, -2)
    if is_concrete(x) and not bool(np.isnan(np.asarray(x)).any()):
        a, b, two_c, three_d = _natural_cubic_coeffs_dense(t, xT)
    else:
        a, b, two_c, three_d = _natural_cubic_coeffs_masked(t, xT, _version)

    # Pack as (..., length - 1, 4 * channels) in the reference's
    # cat([a, b, two_c, three_d], -1) channel layout
    # (interpolation_cubic.py:184-189).
    coeffs = jnp.stack([a, b, two_c, three_d], axis=-3)  # (..., 4, C, L - 1)
    coeffs = jnp.moveaxis(coeffs, -1, -3)  # (..., L - 1, 4, C)
    return coeffs.reshape(coeffs.shape[:-2] + (coeffs.shape[-2] * coeffs.shape[-1],))


def natural_cubic_spline_coeffs(x, t=None):
    """DEPRECATED; kept for API parity (interpolation_cubic.py:193-230).

    Endpoint NaNs are imputed with the nearest observation (_version=0).
    Returns coefficients of shape (..., length - 1, 4 * channels) to be passed
    to ``CubicSpline``.
    """
    return _natural_cubic_spline_coeffs(x, t, _version=0)


def natural_cubic_coeffs(x, t=None):
    """Natural cubic spline coefficients (interpolation_cubic.py:233-265).

    x: (..., length, channels), NaNs mark missing values; t: optional 1-D
    strictly-increasing times (defaults to 0..length-1).  Returns a plain
    array (..., length - 1, 4 * channels) — savable, dataloader-friendly — to
    be passed to ``CubicSpline``.
    """
    return _natural_cubic_spline_coeffs(x, t, _version=1)


class CubicSpline(InterpolationBase):
    """Evaluates any packed cubic coefficients (natural or Hermite).

    Reference: interpolation_cubic.py:268-336.  Default grid is
    t = [0, 1, ..., n_intervals] (note: coeffs have one row per *interval*, so
    this is linspace(0, n, n + 1) — deliberately different from
    LinearInterpolation's knot-per-row convention).
    """

    _pytree_fields = ("_t", "_a", "_b", "_two_c", "_three_d")

    def __init__(self, coeffs, t=None):
        coeffs = jnp.asarray(coeffs)
        if t is None:
            # Host NumPy constant: stays concrete under jit, keeping solver
            # step counts static (see utils.misc.validate_input_path).
            t = np.linspace(
                0, coeffs.shape[-2], coeffs.shape[-2] + 1, dtype=np.dtype(coeffs.dtype)
            )
        elif not isinstance(t, np.ndarray):
            t = jnp.asarray(t)

        channels = coeffs.shape[-1] // 4
        if channels * 4 != coeffs.shape[-1]:
            raise ValueError("Passed invalid coeffs.")
        self._t = t
        self._a = coeffs[..., :channels]
        self._b = coeffs[..., channels : 2 * channels]
        self._two_c = coeffs[..., 2 * channels : 3 * channels]
        self._three_d = coeffs[..., 3 * channels :]

    @property
    def grid_points(self):
        return self._t

    @property
    def interval(self):
        from ..utils.misc import stack_endpoints

        return stack_endpoints(self._t)

    def _interpret_t(self, t):
        t = jnp.asarray(t, dtype=self._b.dtype)
        maxlen = self._b.shape[-2] - 1
        index = jnp.clip(jnp.searchsorted(self._t, jax.lax.stop_gradient(t), side="left") - 1, 0, maxlen)
        fractional_part = t - jnp.take(self._t, index)
        return fractional_part, index

    def evaluate(self, t):
        fractional_part, index = self._interpret_t(t)
        fractional_part = fractional_part[..., None]
        inner = 0.5 * jnp.take(self._two_c, index, axis=-2) + jnp.take(
            self._three_d, index, axis=-2
        ) * fractional_part / 3
        inner = jnp.take(self._b, index, axis=-2) + inner * fractional_part
        return jnp.take(self._a, index, axis=-2) + inner * fractional_part

    def derivative(self, t):
        fractional_part, index = self._interpret_t(t)
        fractional_part = fractional_part[..., None]
        inner = jnp.take(self._two_c, index, axis=-2) + jnp.take(
            self._three_d, index, axis=-2
        ) * fractional_part
        return jnp.take(self._b, index, axis=-2) + inner * fractional_part


register_control(CubicSpline)


class NaturalCubicSpline(CubicSpline):
    """DEPRECATED alias (interpolation_cubic.py:339-346)."""
