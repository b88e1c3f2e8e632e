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
    reference's cummax-gather behavior.
    """
    axis = fill_index % x.ndim
    observed = ~jnp.isnan(x)
    prev_idx = prev_observed_index(observed, axis=axis)
    gathered = jnp.take_along_axis(x, jnp.maximum(prev_idx, 0), axis=axis)
    return jnp.where(prev_idx >= 0, gathered, x)


def backward_fill(x, fill_index=-2):
    """Backward fills NaNs along ``fill_index``; trailing NaNs stay NaN."""
    axis = fill_index % x.ndim
    n = x.shape[axis]
    observed = ~jnp.isnan(x)
    nxt_idx = next_observed_index(observed, axis=axis)
    gathered = jnp.take_along_axis(x, jnp.minimum(nxt_idx, n - 1), axis=axis)
    return jnp.where(nxt_idx <= n - 1, gathered, x)
