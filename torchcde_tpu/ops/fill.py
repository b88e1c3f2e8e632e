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
