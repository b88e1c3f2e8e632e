"""Knot-aligned fused fixed-step CDE solver.

The hot loop of the reference (SURVEY.md section 3.1) is: per solver stage,
locate the spline interval (bucketize) and gather its coefficients, then
contract with the vector field.  For the canonical workload — fixed steps over
a control with a concrete knot grid, output times on the grid (e.g.
``cdeint(X, f, z0, t=X.interval, method="rk4", step_size=...)``) — the
interval of every stage is known *statically*: the step loop can be a
``lax.scan`` whose xs are the per-interval coefficient rows themselves.
No searchsorted, no dynamic gathers, perfectly linear streaming of the
coefficient arrays.

Falls back (returns None) whenever its preconditions don't hold; ``cdeint``
then uses the general path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..interpolation.cubic import CubicSpline
from ..utils.misc import is_concrete
from .runge_kutta import STEPPERS

_MAX_SUBSTEPS = 256


def _knot_indices(grid, ts):
    """Host-side: index of each output time in the knot grid, or None."""
    idx = np.searchsorted(grid, ts)
    idx = np.clip(idx, 0, len(grid) - 1)
    if not np.allclose(grid[idx], ts, rtol=1e-12, atol=1e-12):
        return None
    return idx


_STATE_FREE = ("euler", "midpoint", "heun", "rk4")


def plan_fixed_grid(X, ts, step_size):
    """Host-side analysis shared by the fused fast paths.

    Returns ``(rows, grid, out_idx, j0, jN, m, step_size_val, uniform)`` when
    the solve is a knot-aligned fixed-step walk over a cubic control, else
    None.  Preconditions: concrete knot grid and output times, output times
    on the grid, and a concrete step_size dividing every knot span the same
    number (m) of times.

    LinearInterpolation is deliberately NOT fusable: its derivative is
    piecewise-constant and the reference's bucketize semantics are
    left-continuous at interior knots (interpolation_linear.py:203-210), so a
    stage landing exactly on a knot reads the *previous* interval's slope.
    The general path reproduces that; a row-streamed walk would not.  Cubic
    derivatives are continuous at knots, so the fused paths agree there.
    """
    if step_size is None or not is_concrete(step_size):
        return None
    if not isinstance(X, CubicSpline):
        return None
    rows = (X._a, X._b, X._two_c, X._three_d)
    grid = X.grid_points
    if not isinstance(grid, np.ndarray):
        return None
    if isinstance(ts, np.ndarray):
        ts_np = ts.astype(np.float64)
    elif is_concrete(ts):
        # NB: no stop_gradient here — inside jit it would stage the host
        # constant into a tracer; concrete non-tracer values convert directly.
        ts_np = np.asarray(ts, dtype=np.float64)
    else:
        return None
    out_idx = _knot_indices(grid, ts_np)
    if out_idx is None:
        return None
    j0, jN = int(out_idx[0]), int(out_idx[-1])
    if jN <= j0:
        return None
    spans = np.diff(grid[j0 : jN + 1].astype(np.float64))
    step_size_val = float(step_size)
    m_per = spans / step_size_val
    m = int(np.max(np.round(m_per)))
    # step_size must divide every span so the step sequence is identical to
    # the general interval-clamped path.
    if m > _MAX_SUBSTEPS or m < 1 or not np.allclose(
        np.round(m_per) * step_size_val, spans, rtol=1e-9, atol=1e-12
    ) or not np.all(np.round(m_per) == m):
        return None
    uniform = bool(np.allclose(spans, spans[0], rtol=1e-9, atol=1e-12))
    return rows, grid, out_idx, j0, jN, m, step_size_val, uniform


def try_fused_fixed(X, func, z0, ts, method, step_size, pallas_only=False):
    """Returns the solution (time-leading) or None if not applicable.

    ``pallas_only=True`` restricts to the fully-fused Pallas kernel path
    (used by the adjoint dispatch, where falling back to the XLA step scan
    would silently abandon the adjoint's memory contract).

    Preconditions: state-free RK method, array state, plus plan_fixed_grid's
    grid conditions (so the step sequence is *identical* to the general
    path).
    """
    if method not in _STATE_FREE or isinstance(z0, (tuple, list)):
        return None
    plan = plan_fixed_grid(X, ts, step_size)
    if plan is None:
        return None
    rows, grid, out_idx, j0, jN, m, step_size_val, uniform = plan
    stepper = STEPPERS[method]
    spans = np.diff(grid[j0 : jN + 1].astype(np.float64))

    if uniform:
        # Uniform knot spacing + the canonical MLP vector field: the whole
        # solve can run inside one Pallas TPU kernel (no per-stage HLO
        # dispatch; see solvers/fused_pallas.py).  Declines (returns None)
        # off-TPU or outside its shape caps.
        from .fused_pallas import try_fused_mlp_pallas
        from .terms import MLPVectorField

        if isinstance(func, MLPVectorField):
            sliced = tuple(r[..., j0:jN, :] for r in rows[1:])
            out = try_fused_mlp_pallas(
                sliced, z0, func, method, m, step_size_val, jN - j0,
                out_knots=tuple(int(k) - j0 for k in out_idx),
            )
            if out is not None:
                return out

    if pallas_only:
        return None

    is_prod = hasattr(func, "prod")
    tableau_step = stepper.step

    # xs: per-interval coefficient rows + left knot time + interval width.
    def slice_rows(r):
        return jnp.moveaxis(r[..., j0:jN, :], -2, 0)

    xs_rows = tuple(slice_rows(r) for r in rows)
    t_left = jnp.asarray(grid[j0:jN], dtype=jnp.result_type(rows[0].dtype))
    width = jnp.asarray(spans, dtype=t_left.dtype)

    def interval_step(z, xs):
        rows_j, tl, w = xs
        _a_j, b_j, c_j, d_j = rows_j

        def dXdt(tau):
            frac = (tau - tl)[..., None]
            return b_j + (c_j + d_j * frac) * frac

        def rhs(tau, zz):
            cg = dXdt(tau)
            if is_prod:
                return func.prod(tau, zz, cg)
            vf = func(tau, zz)
            if vf.shape[-1] * vf.shape[-2] <= 4096:
                return jnp.sum(vf * cg[..., None, :], axis=-1)
            return jnp.einsum("...hi,...i->...h", vf, cg)

        if m == 1:
            z1, _err, _ = tableau_step(rhs, tl, z, w, None)
            return z1, z1

        def substep(carry, i):
            zz, tcur = carry
            dt = jnp.clip(tl + w - tcur, 0.0, step_size_val)
            z1, _err, _ = tableau_step(rhs, tcur, zz, dt, None)
            return (z1, tcur + dt), None

        (z1, _), _ = jax.lax.scan(substep, (z, tl), jnp.arange(m))
        return z1, z1

    zN, z_knots = jax.lax.scan(interval_step, z0, (xs_rows, t_left, width))
    # z at knot j0 + 1 + k is z_knots[k]; prepend z0 for knot j0.
    all_knots = jnp.concatenate([z0[None], z_knots], axis=0)
    return jnp.take(all_knots, jnp.asarray(out_idx - j0), axis=0)
