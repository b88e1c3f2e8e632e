"""Shared eligibility predicate for the streaming TPU Pallas kernels.

The length-axis streaming kernels (ops/fill_pallas.py,
ops/masked_tridiagonal_pallas.py, ops/masked_cubic_pallas.py,
ops/tridiagonal_pallas.py) pay a fixed grid/layout cost, so they only
dispatch on TPU with enough batch rows to fill the vector lanes and enough
length to amortise the per-block carry hops; everything else takes the XLA
scan paths.  One predicate so the thresholds cannot drift between call sites.

Dtype policy (one rule for every kernel): f32 and bf16 are eligible.  bf16
operands are upcast to f32 at the kernel boundary (``upcast_kernel_operands``)
and results cast back — the kernels' divisions and carried reductions need
f32, and the cast costs one VPU pass against the many the kernels save.
"""

import jax
import jax.numpy as jnp

# The dtypes the streaming kernels accept at their boundary.  Computation is
# always f32 internally (bf16's 8 mantissa bits are not enough for the
# tridiagonal pivots / carried prefix products).
KERNEL_DTYPES = (jnp.float32, jnp.bfloat16)


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
        and dtype in KERNEL_DTYPES
        and batch >= min_batch
        and shape[-1] >= min_length
    )


def upcast_kernel_operands(*arrays):
    """bf16 operands enter the kernels as f32; other dtypes pass through.
    Returns (arrays, restore) where ``restore(out)`` casts a result back to
    the first operand's original dtype."""
    orig = arrays[0].dtype
    if orig == jnp.bfloat16:
        arrays = tuple(
            a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a for a in arrays
        )
        restore = lambda out: out.astype(orig)
    else:
        restore = lambda out: out
    return arrays, restore
