"""Pallas TPU kernel: batched Thomas tridiagonal solve.

The natural-cubic-spline fit's hot kernel (SURVEY.md section 3.3; reference
misc.py:13-67 runs the same recurrence as a Python loop).  Layout is
(length, batch): the length dimension is the sequential recurrence, the batch
dimension rides the 128 VPU lanes, and each grid step owns one 128-wide lane
block resident in VMEM — the forward sweep and back-substitution each touch
VMEM only, so HBM sees exactly one read of the system and one write of the
solution.

Differentiable via custom_vjp: for x = A^{-1} b,
    grad_b = A^{-T} g            (one more tridiagonal solve, swapped bands)
    grad_diag_i  = -grad_b_i * x_i
    grad_upper_i = -grad_b_i * x_{i+1}
    grad_lower_i = -grad_b_{i+1} * x_i
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# VMEM holds ~7 arrays of (K, 128) f32; cap K so they fit in ~16MB.
MAX_PALLAS_LENGTH = 2048


def _thomas_kernel(d_ref, b_ref, u_ref, l_ref, out_ref, nd_ref, nb_ref):
    k = d_ref.shape[0]

    def row(ref, i):
        return ref[pl.ds(i, 1), :]  # (1, 128): keeps every op 2-D for Mosaic

    nd_ref[pl.ds(0, 1), :] = row(d_ref, 0)
    nb_ref[pl.ds(0, 1), :] = row(b_ref, 0)

    # Forward sweep carries the previous pivot row in registers, so each
    # iteration reads each input row exactly once.
    def fwd(i, carry):
        prev_nd, prev_nb = carry
        w = row(l_ref, i - 1) / prev_nd
        nd = row(d_ref, i) - w * row(u_ref, i - 1)
        nb = row(b_ref, i) - w * prev_nb
        nd_ref[pl.ds(i, 1), :] = nd
        nb_ref[pl.ds(i, 1), :] = nb
        return nd, nb

    first = (row(d_ref, 0), row(b_ref, 0))
    jax.lax.fori_loop(1, k, fwd, first)

    x_last = row(nb_ref, k - 1) / row(nd_ref, k - 1)
    out_ref[pl.ds(k - 1, 1), :] = x_last

    def bwd(j, x_next):
        i = k - 2 - j
        x = (row(nb_ref, i) - row(u_ref, i) * x_next) / row(nd_ref, i)
        out_ref[pl.ds(i, 1), :] = x
        return x

    jax.lax.fori_loop(0, k - 1, bwd, x_last)


def _tile_width(k, n):
    """Widest batch tile that divides n and whose ~7 (k, tile) f32 buffers
    fit in VMEM; wider tiles fill more VPU sublanes per recurrence row."""
    budget = 12 * 1024 * 1024 // (7 * 4 * max(k, 1))  # lane columns in budget
    tile = _LANES
    while tile * 2 <= budget and n % (tile * 2) == 0 and tile < 2048:
        tile *= 2
    return tile


def _thomas_pallas_2d(d, b, u, l):
    """Solve for (k, n) arrays (length-major, batch in lanes); n % 128 == 0."""
    k, n = d.shape
    tile = _tile_width(k, n)
    grid = (n // tile,)
    spec = pl.BlockSpec((k, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((k, n), d.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((k, tile), d.dtype),
            pltpu.VMEM((k, tile), d.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * k * n, bytes_accessed=5 * 4 * k * n, transcendentals=0
        ),
    )(d, b, u, l)


def _solve_flat(b, u, d, l):
    """b, d: (N, k); u, l: (N, k - 1).  Returns x (N, k)."""
    n, k = b.shape
    zeros = jnp.zeros((n, 1), dtype=b.dtype)
    u_p = jnp.concatenate([u, zeros], axis=-1)
    l_p = jnp.concatenate([l, zeros], axis=-1)  # l_p[i] couples row i+1 to i

    pad = (-n) % _LANES
    ones_d = jnp.ones((pad, k), dtype=b.dtype)
    zeros_r = jnp.zeros((pad, k), dtype=b.dtype)
    d_f = jnp.concatenate([d, ones_d], axis=0) if pad else d
    b_f = jnp.concatenate([b, zeros_r], axis=0) if pad else b
    u_f = jnp.concatenate([u_p, zeros_r], axis=0) if pad else u_p
    l_f = jnp.concatenate([l_p, zeros_r], axis=0) if pad else l_p

    x = _thomas_pallas_2d(d_f.T, b_f.T, u_f.T, l_f.T).T
    return x[:n] if pad else x


@jax.custom_vjp
def _tridiagonal_pallas(b, u, d, l):
    return _solve_flat(b, u, d, l)


def _tp_fwd(b, u, d, l):
    x = _solve_flat(b, u, d, l)
    return x, (x, u, d, l)


def _tp_bwd(res, g):
    x, u, d, l = res
    # A^T has the bands swapped.
    y = _solve_flat(g, l, d, u)
    grad_b = y
    grad_d = -y * x
    grad_u = -y[..., :-1] * x[..., 1:]
    grad_l = -y[..., 1:] * x[..., :-1]
    return grad_b, grad_u, grad_d, grad_l


_tridiagonal_pallas.defvjp(_tp_fwd, _tp_bwd)


def tridiagonal_solve_pallas(b, A_upper, A_diagonal, A_lower):
    """Drop-in for ops.tridiagonal.tridiagonal_solve on TPU.

    Same signature/broadcast semantics as the reference misc.py:13-67:
    b (..., k), A_upper/A_lower (..., k - 1), A_diagonal (..., k).
    """
    shape = jnp.broadcast_shapes(A_diagonal.shape, b.shape)
    k = shape[-1]
    if k > MAX_PALLAS_LENGTH:
        raise ValueError(
            f"Pallas Thomas kernel holds the full system in VMEM; length {k} "
            f"exceeds the {MAX_PALLAS_LENGTH} cap. Use method='pcr' or 'thomas'."
        )
    off_shape = shape[:-1] + (k - 1,)
    b_ = jnp.broadcast_to(b, shape).reshape(-1, k)
    d_ = jnp.broadcast_to(A_diagonal, shape).reshape(-1, k)
    u_ = jnp.broadcast_to(A_upper, off_shape).reshape(-1, k - 1)
    l_ = jnp.broadcast_to(A_lower, off_shape).reshape(-1, k - 1)
    x = _tridiagonal_pallas(b_, u_, d_, l_)
    return x.reshape(shape)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False
