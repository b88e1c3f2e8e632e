"""NaN fill / observed-index kernels, fully vectorized.

Reference behavior: ``forward_fill`` (/root/reference/torchcde/misc.py:103-126)
fills NaNs downward along an axis with the last observed value, leaving
leading NaNs (before any observation) as NaN.  The reference vectorizes via
cumsum/cummax/gather; here the same idea becomes cummax over observed indices,
which XLA fuses into a single pass.

Also provides the prev/next observed-index scans that replace the reference's
per-scalar Python recursions over NaN runs
(/root/reference/torchcde/interpolation_linear.py:13-84, with its
"TODO: parallelise over this") with masked gathers.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _iota_like(x, axis):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, axis % x.ndim)


def prev_observed_index(observed, axis=-2):
    """For each position, index of the most recent True at or before it; -1 if none."""
    idx = _iota_like(observed, axis)
    marked = jnp.where(observed, idx, -1)
    return jax.lax.cummax(marked, axis=axis % observed.ndim)


def masked_fill_scan(values, observed, axis=-1, reverse=False):
    """Carries the most recent observed entry of each array in ``values``
    forward (or backward) along ``axis`` — gather-free.

    TPU gathers are scalar-expensive; this replaces take-along-axis fills with
    a select-combine associative scan (log2(n) full-width vector passes).
    Positions before the first observation keep their original entries.
    """
    single = not isinstance(values, (tuple, list))
    if single:
        values = (values,)

    def combine(a, b):
        # b is "later" in scan order; keep b's payload where b is valid.
        a_vals, a_flag = a[:-1], a[-1]
        b_vals, b_flag = b[:-1], b[-1]
        out = tuple(jnp.where(b_flag, bv, av) for av, bv in zip(a_vals, b_vals))
        return out + (a_flag | b_flag,)

    elems = tuple(values) + (observed,)
    out = jax.lax.associative_scan(combine, elems, axis=axis % observed.ndim,
                                   reverse=reverse)
    filled = out[:-1]
    return filled[0] if single else filled


def next_observed_index(observed, axis=-2):
    """For each position, index of the nearest True at or after it; size if none."""
    axis = axis % observed.ndim
    n = observed.shape[axis]
    idx = _iota_like(observed, axis)
    marked = jnp.where(observed, idx, n)
    return jax.lax.cummin(marked, axis=axis, reverse=True)


def forward_fill(x, fill_index=-2):
    """Forward fills NaNs along ``fill_index`` (reference: misc.py:103-126).

    Leading NaNs (no prior observation) are left as NaN, matching the
    reference's cummax-gather behavior.  When filling along the
    second-to-last axis of an array with a small trailing (channel) axis, the
    scan/gather runs with the fill axis minor — small channel counts waste
    TPU vector lanes otherwise.
    """
    axis = fill_index % x.ndim
    if axis == x.ndim - 2 and x.shape[-1] < 32 <= x.shape[axis]:
        return jnp.swapaxes(forward_fill(jnp.swapaxes(x, -1, -2), -1), -1, -2)
    observed = ~jnp.isnan(x)
    return masked_fill_scan(x, observed, axis=axis)


def backward_fill(x, fill_index=-2):
    """Backward fills NaNs along ``fill_index``; trailing NaNs stay NaN."""
    axis = fill_index % x.ndim
    n = x.shape[axis]
    observed = ~jnp.isnan(x)
    nxt_idx = next_observed_index(observed, axis=axis)
    gathered = jnp.take_along_axis(x, jnp.minimum(nxt_idx, n - 1), axis=axis)
    return jnp.where(nxt_idx <= n - 1, gathered, x)


def _fill_dispatch(values, observed, axis, reverse):
    from .pallas_dispatch import streaming_kernel_eligible

    axis = axis % observed.ndim
    if (
        axis == observed.ndim - 1
        and all(
            streaming_kernel_eligible(observed.shape, v.dtype, min_length=256)
            for v in values
        )
    ):
        from .fill_pallas import masked_fill_pallas

        return masked_fill_pallas(tuple(values), observed, reverse=reverse)
    return masked_fill_scan(tuple(values), observed, axis=axis, reverse=reverse)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _masked_fill(values, observed, axis, reverse):
    return _fill_dispatch(values, observed, axis, reverse)


def _masked_fill_fwd(values, observed, axis, reverse):
    return _fill_dispatch(values, observed, axis, reverse), observed


def _masked_fill_bwd(axis, reverse, observed, g):
    # y_i = v at the most recent observed position at/before i (after, when
    # reverse), with the array's boundary entry flowing before any
    # observation.  The cotangent of source j is the segment sum of g over
    # the positions j serves: a directional cumsum minus its value at the
    # next source, fetched gather-free with a sentinel-extended fill.
    axis_ = axis % observed.ndim

    def per_leaf(gl):
        S = jax.lax.cumsum(gl, axis=axis_, reverse=not reverse)
        n = observed.shape[axis_]
        pad = [(0, 0)] * observed.ndim
        pad[axis_] = (1, 0) if reverse else (0, 1)
        S_ext = jnp.pad(S, pad)
        obs_ext = jnp.pad(observed, pad, constant_values=True)
        Sn = masked_fill_scan(S_ext, obs_ext, axis=axis_, reverse=not reverse)
        # value of S at the nearest source strictly beyond i
        sl = [slice(None)] * observed.ndim
        sl[axis_] = slice(0, n) if reverse else slice(1, n + 1)
        Sn_strict = Sn[tuple(sl)]
        seg = S - Sn_strict
        idx = jax.lax.broadcasted_iota(jnp.int32, observed.shape, axis_)
        boundary = idx == (n - 1 if reverse else 0)
        return jnp.where(observed | boundary, seg, jnp.zeros_like(seg))

    return (tuple(per_leaf(gl) for gl in g), None)


_masked_fill.defvjp(_masked_fill_fwd, _masked_fill_bwd)


def masked_fill(values, observed, axis=-1, reverse=False):
    """Differentiable masked fill with TPU streaming-kernel dispatch.

    Same semantics as ``masked_fill_scan``; on TPU with large (..., length)
    f32 inputs the fill runs as one VMEM-resident Pallas pass
    (ops/fill_pallas.py) instead of log2(n) associative-scan HBM passes, and
    gradients use the analytic segment-sum VJP either way.
    """
    single = not isinstance(values, (tuple, list))
    vals = (values,) if single else tuple(values)
    out = _masked_fill(vals, observed, axis, reverse)
    return out[0] if single else out
