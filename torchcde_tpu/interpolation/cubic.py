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

from functools import partial

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


def _masked_thomas_observed(diag, rhs, hr, hr_prev, observed):
    """Thomas solve of the 'gappy' tridiagonal system living at observed
    positions of the full grid, gather-free.

    The reduced natural-spline system couples consecutive *observed* knots;
    rather than compacting them (argsort + gathers — scalar-expensive on
    TPU), the forward sweep and back-substitution scan the full grid and pass
    the carry through missing rows with selects.  All arrays (..., length);
    couplings: upper/lower between observed knot and its next observed
    neighbour are both hr (at the earlier knot); hr_prev is hr carried from
    the previous observed position.
    """
    length = diag.shape[-1]
    dT = jnp.moveaxis(diag, -1, 0)
    rT = jnp.moveaxis(rhs, -1, 0)
    hT = jnp.moveaxis(hr, -1, 0)
    hpT = jnp.moveaxis(hr_prev, -1, 0)
    oT = jnp.moveaxis(observed, -1, 0)

    def fwd(carry, inp):
        prev_d, prev_b = carry
        d_i, r_i, hp_i, o_i = inp
        w = hp_i / prev_d
        nd = d_i - w * hp_i
        nb = r_i - w * prev_b
        nd = jnp.where(o_i, nd, prev_d)
        nb = jnp.where(o_i, nb, prev_b)
        out_d = jnp.where(o_i, nd, jnp.ones_like(nd))
        out_b = jnp.where(o_i, nb, jnp.zeros_like(nb))
        return (nd, nb), (out_d, out_b)

    ones = jnp.ones_like(dT[0])
    zeros = jnp.zeros_like(dT[0])
    _, (ndT, nbT) = jax.lax.scan(fwd, (ones, zeros), (dT, rT, hpT, oT))

    def bwd(carry, inp):
        x_next = carry
        nd_i, nb_i, h_i, o_i = inp
        x_i = (nb_i - h_i * x_next) / nd_i
        x_next = jnp.where(o_i, x_i, x_next)
        return x_next, jnp.where(o_i, x_i, jnp.zeros_like(x_i))

    _, xT = jax.lax.scan(bwd, zeros, (ndT, nbT, hT, oT), reverse=True)
    return jnp.moveaxis(xT, 0, -1)


def _masked_solve_impl(diag, rhs, hr, hr_prev, observed):
    """Dispatch the gappy solve: streaming Pallas kernels on TPU for large
    batches (ops/masked_tridiagonal_pallas.py — prefix-scan blocks at ~4x the
    lax.scan), the masked Thomas scan otherwise."""
    from ..ops.pallas_dispatch import streaming_kernel_eligible

    if streaming_kernel_eligible(diag.shape, diag.dtype):
        from ..ops.masked_tridiagonal_pallas import masked_thomas_pallas

        return masked_thomas_pallas(diag, rhs, hr, hr_prev, observed)
    return _masked_thomas_observed(diag, rhs, hr, hr_prev, observed)


@jax.custom_vjp
def _masked_solve(diag, rhs, hr, hr_prev, observed):
    return _masked_solve_impl(diag, rhs, hr, hr_prev, observed)


def _masked_solve_fwd(diag, rhs, hr, hr_prev, observed):
    x = _masked_solve_impl(diag, rhs, hr, hr_prev, observed)
    return x, (diag, hr, hr_prev, observed, x)


def _masked_solve_bwd(res, g):
    # The reduced system is symmetric (A_ij = A_ji = hr at the earlier
    # observed knot), so the transpose solve reuses the same bands:
    #   y = A^{-1} g;  d_bar = -y * x;  hr_bar_i = -y_i x_nextobs;
    #   hr_prev_bar_i = -y_i x_prevobs.
    # CONTRACT: callers must pass hr_prev = previous-observed fill of hr (as
    # the fit construction does).  These partials are those of A(bands)^{-1}
    # rhs, which agrees with the scan algorithm on that consistent manifold;
    # the split of the coupling gradient between hr_j and hr_prev_{next j}
    # differs from scan-AD, but their total through the fill is identical.
    from ..ops.fill import masked_fill

    diag, hr, hr_prev, observed, x = res
    y = _masked_solve_impl(diag, g, hr, hr_prev, observed)
    xf = masked_fill(x, observed, axis=-1)
    xb = masked_fill(x, observed, axis=-1, reverse=True)
    zero = jnp.zeros_like(x[..., :1])
    x_prev = jnp.concatenate([zero, xf[..., :-1]], axis=-1)
    x_next = jnp.concatenate([xb[..., 1:], zero], axis=-1)
    obs_f = observed.astype(x.dtype)
    return (
        -y * x * obs_f,
        y * obs_f,
        -y * x_next * obs_f,
        -y * x_prev * obs_f,
        None,
    )


_masked_solve.defvjp(_masked_solve_fwd, _masked_solve_bwd)


def _natural_cubic_coeffs_masked(t, x, _version):
    """NaN-aware natural spline on (..., length), length last, fully batched
    and gather-free.

    Reproduces _natural_cubic_spline_coeffs_with_missing_values_scalar
    (interpolation_cubic.py:78-167) for every batch row and channel at once:
    next-observed quantities come from select-combine fill scans, the reduced
    tridiagonal system is solved in place on the full grid by a masked Thomas
    scan, and the reference's sequential polynomial re-basing walk
    (interpolation_cubic.py:147-162) becomes one forward fill scan.

    On TPU with large f32 batches the whole post-imputation fit dispatches to
    four fused streaming Pallas kernels (ops/masked_cubic_pallas.py); the XLA
    pipeline below remains the reference implementation and the backward
    path.
    """
    any_obs = jnp.any(~jnp.isnan(x), axis=-1, keepdims=True)

    t_arr = jnp.asarray(t).astype(x.dtype)
    if _fused_fit_ok(x):
        # Raw values go straight to the kernels: the endpoint imputation
        # happens in-kernel (ops/masked_cubic_pallas.py:_prep_kernel_bm), so
        # the full-grid array never makes a dedicated imputation pass.
        a, b, two_c, three_d = _masked_fit_fused(_version, t_arr, x)
    else:
        x = _impute_endpoints(x, _version)
        a, b, two_c, three_d = _masked_coeffs_xla(t_arr, x)

    # All-NaN channels: constant zero path (interpolation_cubic.py:85-92).
    zero = jnp.zeros_like(a)
    return (
        jnp.where(any_obs, a, zero),
        jnp.where(any_obs, b, zero),
        jnp.where(any_obs, two_c, zero),
        jnp.where(any_obs, three_d, zero),
    )


def _impute_endpoints(x, _version):
    """Endpoint imputation (interpolation_cubic.py:101-131): version 0
    replaces only a missing first/last entry with the nearest observation;
    version 1 fills forward/backward from the first/last observation.
    Interior NaNs stay missing either way."""
    length = x.shape[-1]
    observed = ~jnp.isnan(x)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    first_idx = jnp.argmax(observed, axis=-1)[..., None]
    last_idx = (length - 1) - jnp.argmax(jnp.flip(observed, axis=-1), axis=-1)[..., None]
    v_first = jnp.take_along_axis(x, first_idx, axis=-1)
    v_last = jnp.take_along_axis(x, last_idx, axis=-1)

    if _version == 0:
        x = jnp.where((pos == 0) & ~observed, v_first, x)
        x = jnp.where((pos == length - 1) & ~observed, v_last, x)
    else:
        x = jnp.where(pos < first_idx, v_first, x)
        x = jnp.where(pos > last_idx, v_last, x)
    return x


def _fused_fit_ok(x):
    from ..ops.pallas_dispatch import streaming_kernel_eligible

    return streaming_kernel_eligible(x.shape, x.dtype)


def _masked_coeffs_xla(t, x):
    """The post-imputation masked fit as XLA ops (fills + masked solve +
    re-basing) — the reference implementation for the fused TPU kernels and
    the backward path of ``_masked_fit_fused``."""
    from ..ops.fill import masked_fill

    observed = ~jnp.isnan(x)
    x_safe = jnp.where(observed, x, jnp.zeros_like(x))
    t_b = jnp.broadcast_to(t.astype(x.dtype), x.shape)

    # Next observed (value, time) strictly after each position.
    xn_inc, tn_inc = masked_fill((x_safe, t_b), observed, axis=-1, reverse=True)
    pad_x = xn_inc[..., -1:]
    pad_t = tn_inc[..., -1:] + 1  # sentinel: no later observation
    xn = jnp.concatenate([xn_inc[..., 1:], pad_x], axis=-1)
    tn = jnp.concatenate([tn_inc[..., 1:], pad_t], axis=-1)

    # An interval starts at an observed position that has a later observation.
    later_obs = jnp.flip(jnp.cumsum(jnp.flip(observed, -1).astype(jnp.int32), -1), -1)
    has_next = observed & (later_obs > 1)

    h = tn - t_b
    hr = jnp.where(has_next, 1.0 / jnp.where(has_next, h, jnp.ones_like(h)), 0.0)
    six_pd_hr = 6 * (xn - x_safe) * hr
    pds = 0.5 * six_pd_hr * hr

    # Previous-observed-interval quantities (hr, pds at the previous observed
    # knot), forward-filled exclusively.
    hr_f, pds_f = masked_fill((hr, pds), observed, axis=-1)
    zero_col = jnp.zeros_like(hr[..., :1])
    hr_prev = jnp.concatenate([zero_col, hr_f[..., :-1]], axis=-1)
    pds_prev = jnp.concatenate([zero_col, pds_f[..., :-1]], axis=-1)

    diag = 2 * (hr_prev + hr)
    diag = jnp.where(observed & (diag > 0), diag, jnp.ones_like(diag))
    rhs = pds_prev + pds

    kd = _masked_solve(diag, rhs, hr, hr_prev, observed)

    # kd at the next observed knot (strictly after).
    kdn_inc = masked_fill(kd, observed, axis=-1, reverse=True)
    kdn = jnp.concatenate([kdn_inc[..., 1:], kdn_inc[..., -1:]], axis=-1)

    a0 = x_safe
    b0 = kd
    two_c0 = (six_pd_hr - 4 * kd - 2 * kdn) * hr
    three_d0 = (-six_pd_hr + 3 * (kd + kdn)) * hr * hr

    # Re-base: the polynomial of the last observed knot at-or-before each grid
    # interval, via one forward fill scan (replaces the reference's walk).
    a_k, b_k, two_c_k, three_d_k, t_obs = masked_fill(
        (a0, b0, two_c0, three_d0, t_b), observed, axis=-1
    )
    a_k = a_k[..., :-1]
    b_k = b_k[..., :-1]
    two_c_k = two_c_k[..., :-1]
    three_d_k = three_d_k[..., :-1]
    offset = t_obs[..., :-1] - t_b[..., :-1]

    a = a_k + ((0.5 * two_c_k - three_d_k * offset / 3) * offset - b_k) * offset
    b = b_k + (three_d_k * offset - two_c_k) * offset
    two_c = two_c_k - 2 * three_d_k * offset
    three_d = three_d_k
    return a, b, two_c, three_d


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _masked_fit_fused(_version, t, x):
    """Fused-Pallas masked fit on *raw* values (imputation in-kernel);
    numerically matches ``_masked_coeffs_xla`` after ``_impute_endpoints``.
    Backward differentiates the XLA pipeline (recompute — the masked fit is
    offline preprocessing, so the forward speed is what matters)."""
    from ..ops.masked_cubic_pallas import masked_natural_cubic_full

    a, b, two_c, three_d = masked_natural_cubic_full(t, x, _version)
    return a[..., :-1], b[..., :-1], two_c[..., :-1], three_d[..., :-1]


def _masked_fit_fused_fwd(_version, t, x):
    return _masked_fit_fused(_version, t, x), (t, x)


def _masked_fit_fused_bwd(_version, res, g):
    t, x = res
    _, vjp = jax.vjp(
        lambda t_, x_: _masked_coeffs_xla(t_, _impute_endpoints(x_, _version)),
        t, x)
    return vjp(g)


_masked_fit_fused.defvjp(_masked_fit_fused_fwd, _masked_fit_fused_bwd)


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
