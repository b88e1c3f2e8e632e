"""Input validation and small utilities.

Mirrors the reference's eager validation (/root/reference/torchcde/misc.py:70-100)
but TPU-aware: monotonicity is checked with a single vectorized reduction
(``jnp.all(diff > 0)``) instead of the reference's per-element Python loop
(misc.py:85-89), and the check is only *evaluated* when ``t`` is a concrete
array — traced values inside jit cannot be validated without a host sync, so
validation is skipped there (shapes/dtypes are still checked, which is all
that is statically knowable).
"""

import jax
import jax.numpy as jnp
import numpy as np


def cheap_stack(tensors, axis):
    """Reference: misc.py:6-10."""
    if len(tensors) == 1:
        return jnp.expand_dims(tensors[0], axis)
    return jnp.stack(tensors, axis=axis)


def is_concrete(x) -> bool:
    """True if ``x`` carries actual values (not a jit/vmap tracer)."""
    return not isinstance(x, jax.core.Tracer)


def stack_endpoints(t):
    """[t[0], t[-1]] staying host-side (concrete) for NumPy grids."""
    if isinstance(t, np.ndarray):
        return np.stack([t[0], t[-1]])
    return jnp.stack([t[0], t[-1]])


def validate_input_path(x, t):
    """Validates (x, t) and returns the (possibly defaulted) t.

    Reference contract (misc.py:70-100): x floating, ndim >= 2 with layout
    (..., length, channels); t defaults to [0, 1, ..., length - 1]; t must be
    1-D floating, strictly increasing, length-matching, and length >= 2.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise ValueError("X must both be floating point.")
    if x.ndim < 2:
        raise ValueError(
            "X must have at least two dimensions, corresponding to time and "
            "channels. It instead has shape {}.".format(tuple(x.shape))
        )

    if t is None:
        # Built host-side from static shape information as a NumPy constant:
        # inside jit, jnp ops are staged even on constants, so a jnp default
        # grid would become a tracer and downstream solver step counts could
        # no longer be computed statically.
        t = np.linspace(0, x.shape[-2] - 1, x.shape[-2], dtype=np.dtype(x.dtype))

    if not isinstance(t, np.ndarray):
        t = jnp.asarray(t)
    if not jnp.issubdtype(t.dtype, jnp.floating):
        raise ValueError("t must both be floating point.")
    if t.ndim != 1:
        raise ValueError("t must be one dimensional. It instead has shape {}.".format(tuple(t.shape)))

    if x.shape[-2] != t.shape[0]:
        raise ValueError(
            "The time dimension of X must equal the length of t. X has shape {} and t has "
            "shape {}, corresponding to time dimensions of {} and {} respectively.".format(
                tuple(x.shape), tuple(t.shape), x.shape[-2], t.shape[0]
            )
        )

    if t.shape[0] < 2:
        raise ValueError(
            "Must have a time dimension of size at least 2. It instead has shape {}, "
            "corresponding to a time dimension of size {}.".format(tuple(t.shape), t.shape[0])
        )

    if is_concrete(t):
        tv = np.asarray(t)
        if not np.all(np.diff(tv) > 0):
            raise ValueError("t must be monotonically increasing.")

    return t
