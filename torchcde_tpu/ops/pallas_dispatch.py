"""Shared eligibility predicate for the streaming TPU Pallas kernels.

The length-axis streaming kernels (ops/fill_pallas.py,
ops/masked_tridiagonal_pallas.py, ops/masked_cubic_pallas.py) pay a fixed
grid/layout cost, so they only dispatch on TPU for f32 arrays with enough
batch rows to fill the vector lanes and enough length to amortise the
per-block carry hops; everything else takes the XLA scan paths.  One
predicate so the thresholds cannot drift between call sites.
"""

import jax
import jax.numpy as jnp


def streaming_kernel_eligible(shape, dtype, min_batch=512, min_length=512):
    """True when (shape[-1]-length, rest-batch) arrays of ``dtype`` should use
    the streaming Pallas kernels on the current backend."""
    batch = 1
    for dim in shape[:-1]:
        batch *= dim
    return (
        jax.default_backend() == "tpu"
        # A pallas_call would force sharded operands to gather onto one
        # device; on a mesh the XLA paths partition cleanly instead (the same
        # decline rule as the fused solve kernels, fused_pallas.py).
        and jax.device_count() == 1
        and dtype == jnp.float32
        and batch >= min_batch
        and shape[-1] >= min_length
    )
