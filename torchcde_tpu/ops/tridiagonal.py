"""Batched tridiagonal solvers, TPU-first.

Capability parity with the reference's ``tridiagonal_solve``
(/root/reference/torchcde/misc.py:13-67), which runs a *Python-level* Thomas
recurrence over the length dimension.  Here the Thomas recurrence is a single
``lax.scan`` over length with every batch/channel dimension vectorized into VPU
lanes, and a parallel-cyclic-reduction (PCR) variant provides an O(log k)-depth
alternative that maps much better onto the TPU when the length dimension is
long (the scan is sequential in k; PCR is k-parallel per level).

Both are reverse-mode differentiable through XLA (scan/gather AD), which the
spline-coefficient gradients rely on (reference contract:
/root/reference/test/test_tricks.py:21-49 requires gradients to reach the raw
path through the coefficient construction).
"""

import jax
import jax.numpy as jnp


def _broadcast_system(b, A_upper, A_diagonal, A_lower):
    shape = jnp.broadcast_shapes(A_diagonal.shape, b.shape)
    off_shape = shape[:-1] + (shape[-1] - 1,)
    b = jnp.broadcast_to(b, shape)
    A_diagonal = jnp.broadcast_to(A_diagonal, shape)
    A_upper = jnp.broadcast_to(A_upper, off_shape)
    A_lower = jnp.broadcast_to(A_lower, off_shape)
    return b, A_upper, A_diagonal, A_lower


def tridiagonal_solve_thomas(b, A_upper, A_diagonal, A_lower):
    """Thomas algorithm: sequential over length, vectorized over batch.

    Arguments mirror the reference (/root/reference/torchcde/misc.py:31-38):
        b:          (..., k) right-hand side.
        A_upper:    (..., k - 1) superdiagonal.
        A_diagonal: (..., k) main diagonal.
        A_lower:    (..., k - 1) subdiagonal.

    Returns the x of shape (..., k) solving Ax = b.  Batch dimensions
    broadcast mutually, as in the reference.
    """
    b, A_upper, A_diagonal, A_lower = _broadcast_system(b, A_upper, A_diagonal, A_lower)
    k = b.shape[-1]
    if k == 1:
        return b / A_diagonal

    # Move length to the front so lax.scan iterates over it; everything else
    # stays as vector lanes.
    bT = jnp.moveaxis(b, -1, 0)
    dT = jnp.moveaxis(A_diagonal, -1, 0)
    uT = jnp.moveaxis(A_upper, -1, 0)
    lT = jnp.moveaxis(A_lower, -1, 0)

    def fwd(carry, inp):
        prev_d, prev_b = carry
        u_prev, l_prev, d_i, b_i = inp
        w = l_prev / prev_d
        new_d = d_i - w * u_prev
        new_b = b_i - w * prev_b
        return (new_d, new_b), (new_d, new_b)

    init = (dT[0], bT[0])
    (_, _), (new_d_rest, new_b_rest) = jax.lax.scan(fwd, init, (uT, lT, dT[1:], bT[1:]))
    new_d = jnp.concatenate([dT[:1], new_d_rest], axis=0)
    new_b = jnp.concatenate([bT[:1], new_b_rest], axis=0)

    def bwd(carry, inp):
        x_next = carry
        u_i, d_i, b_i = inp
        x_i = (b_i - u_i * x_next) / d_i
        return x_i, x_i

    x_last = new_b[-1] / new_d[-1]
    _, xs = jax.lax.scan(bwd, x_last, (uT, new_d[:-1], new_b[:-1]), reverse=True)
    x = jnp.concatenate([xs, x_last[None]], axis=0)
    return jnp.moveaxis(x, 0, -1)


def tridiagonal_solve_pcr(b, A_upper, A_diagonal, A_lower):
    """Parallel cyclic reduction: O(log k) vectorized elimination levels.

    Same system convention as ``tridiagonal_solve_thomas``.  Each level
    eliminates the coupling to neighbours at distance 2^level with pure
    elementwise arithmetic and shifts, so the whole solve is a handful of
    fused VPU passes over (batch, k) blocks — the right shape for TPU when k
    is large (the sequential Thomas scan cannot use the length dimension's
    parallelism at all).
    """
    b, A_upper, A_diagonal, A_lower = _broadcast_system(b, A_upper, A_diagonal, A_lower)
    k = b.shape[-1]
    if k == 1:
        return b / A_diagonal

    # Pad the off-diagonals to length k: lower[i] couples row i to i-1 (so
    # lower[0] = 0), upper[i] couples row i to i+1 (so upper[k-1] = 0).
    zeros = jnp.zeros_like(b[..., :1])
    lower = jnp.concatenate([zeros, A_lower], axis=-1)
    upper = jnp.concatenate([A_upper, zeros], axis=-1)
    diag = A_diagonal
    rhs = b

    def shift_down(x, s):  # value from row (i - s); zero beyond the boundary
        pad = jnp.zeros_like(x[..., :s])
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)

    def shift_up(x, s):  # value from row (i + s); zero beyond the boundary
        pad = jnp.zeros_like(x[..., :s])
        return jnp.concatenate([x[..., s:], pad], axis=-1)

    n_levels = max(1, (k - 1).bit_length())
    s = 1
    for _ in range(n_levels):
        alpha = -lower / shift_down(jnp.where(diag == 0, jnp.ones_like(diag), diag), s)
        beta = -upper / shift_up(jnp.where(diag == 0, jnp.ones_like(diag), diag), s)
        # Rows < s have no neighbour at i - s; rows >= k - s none at i + s.
        idx = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0).squeeze(-1)
        alpha = jnp.where(idx >= s, alpha, jnp.zeros_like(alpha))
        beta = jnp.where(idx < k - s, beta, jnp.zeros_like(beta))

        diag = diag + alpha * shift_down(upper, s) + beta * shift_up(lower, s)
        rhs = rhs + alpha * shift_down(rhs, s) + beta * shift_up(rhs, s)
        lower = alpha * shift_down(lower, s)
        upper = beta * shift_up(upper, s)
        s *= 2

    return rhs / diag


def tridiagonal_solve(b, A_upper, A_diagonal, A_lower, *, method="auto"):
    """Solves the tridiagonal system Ax = b (reference: misc.py:13-67).

    method: "thomas" (sequential scan, minimal flops), "pcr" (log-depth,
    parallel over length), "pallas" (TPU kernel: in-VMEM PCR+Thomas hybrid,
    any length — measured ~4.2x over the XLA scan / 88 GB/s at 64k x 512), or
    "auto".
    """
    if method == "auto":
        from .pallas_dispatch import streaming_kernel_eligible

        shape = jnp.broadcast_shapes(A_diagonal.shape, b.shape)
        k = shape[-1]
        dtype = jnp.result_type(b.dtype, A_diagonal.dtype)
        if jax.default_backend() == "tpu":
            # The shared streaming-kernel gate (single device, f32/bf16 with
            # bf16 upcast inside the kernel) with this kernel's own
            # batch/length profitability thresholds.
            if streaming_kernel_eligible(shape, dtype, min_batch=1024,
                                         min_length=17):
                method = "pallas"
            elif k > 256:
                # Long systems: the sequential Thomas scan pays per-iteration
                # loop overhead k times on TPU; PCR is log2(k) full-width
                # vector passes instead.
                method = "pcr"
            else:
                method = "thomas"
        else:
            method = "thomas"
    if method == "thomas":
        return tridiagonal_solve_thomas(b, A_upper, A_diagonal, A_lower)
    elif method == "pcr":
        return tridiagonal_solve_pcr(b, A_upper, A_diagonal, A_lower)
    elif method == "pallas":
        from .tridiagonal_pallas import tridiagonal_solve_pallas

        return tridiagonal_solve_pallas(b, A_upper, A_diagonal, A_lower)
    else:
        raise ValueError(f"Unknown tridiagonal method {method!r}")
