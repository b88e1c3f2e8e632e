"""Sequence-sharded tridiagonal solve: distributed parallel cyclic reduction.

The natural-cubic fit's tridiagonal systems have length = the time dimension
(reference misc.py:13-67 runs them on one device); for very long series
(SURVEY.md section 5(b)) the length axis itself must shard across the mesh.
This module runs PCR *across devices* inside ``jax.shard_map``: every
elimination level is local elementwise work plus a halo exchange —
``ppermute`` of an s-row boundary strip while the stride s is smaller than the
local chunk, and a whole-chunk ``ppermute`` by s/k_local hops once it exceeds
it — so the collectives ride ICI neighbour links and the whole system is never
gathered onto one device.

Requires the local chunk length to be a power of two (so every stride at or
above it lands on whole devices); the wrapper pads with identity rows, which
provably never couple into real rows.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _dist_pcr(b, up, lo, d, *, axis, k_loc, n_shards):
    """Local body: arrays (..., k_loc) holding this shard's rows.

    Convention: lo[i] couples global row i to i - s, up[i] to i + s, where the
    stride s doubles each level from 1.
    """
    k_glob = k_loc * n_shards
    me = jax.lax.axis_index(axis)
    gidx = me * k_loc + jax.lax.broadcasted_iota(jnp.int32, (k_loc,), 0)

    def from_prev(x, s):  # x_global[i - s]; zeros beyond the left edge
        if s < k_loc:
            halo = jax.lax.ppermute(
                x[..., k_loc - s:], axis, [(j, j + 1) for j in range(n_shards - 1)]
            )
            return jnp.concatenate([halo, x[..., : k_loc - s]], axis=-1)
        m = s // k_loc
        return jax.lax.ppermute(x, axis, [(j, j + m) for j in range(n_shards - m)])

    def from_next(x, s):  # x_global[i + s]; zeros beyond the right edge
        if s < k_loc:
            halo = jax.lax.ppermute(
                x[..., :s], axis, [(j, j - 1) for j in range(1, n_shards)]
            )
            return jnp.concatenate([x[..., s:], halo], axis=-1)
        m = s // k_loc
        return jax.lax.ppermute(x, axis, [(j, j - m) for j in range(m, n_shards)])

    s = 1
    for _ in range(max(1, (k_glob - 1).bit_length())):
        d_prev = from_prev(d, s)
        d_next = from_next(d, s)
        # Edge ppermutes deliver zeros; mask on the global row index (and
        # guard the division so the untaken where-branch stays finite).
        alpha = jnp.where(gidx >= s, -lo / jnp.where(d_prev == 0, 1.0, d_prev), 0.0)
        beta = jnp.where(
            gidx < k_glob - s, -up / jnp.where(d_next == 0, 1.0, d_next), 0.0
        )
        d = d + alpha * from_prev(up, s) + beta * from_next(lo, s)
        b = b + alpha * from_prev(b, s) + beta * from_next(b, s)
        lo = alpha * from_prev(lo, s)
        up = beta * from_next(up, s)
        s *= 2
    return b / d


def tridiagonal_solve_seq_sharded(
    b, A_upper, A_diagonal, A_lower, mesh, axis="model", batch_axis=None
):
    """Solves Ax = b with the length axis sharded over ``mesh`` axis ``axis``.

    Same system convention and broadcast semantics as
    ``ops.tridiagonal.tridiagonal_solve`` (reference misc.py:31-38); use
    ``batch_axis`` to additionally shard the leading batch dimension (e.g.
    ``axis="model", batch_axis="data"`` on a (data, model) mesh).
    """
    shape = jnp.broadcast_shapes(A_diagonal.shape, b.shape)
    k = shape[-1]
    off = shape[:-1] + (k - 1,)
    b = jnp.broadcast_to(b, shape)
    d = jnp.broadcast_to(A_diagonal, shape)
    zeros = jnp.zeros(shape[:-1] + (1,), b.dtype)
    up = jnp.concatenate([jnp.broadcast_to(A_upper, off), zeros], axis=-1)
    lo = jnp.concatenate([zeros, jnp.broadcast_to(A_lower, off)], axis=-1)

    n = mesh.shape[axis]
    k_loc = 1 << int(np.ceil(np.log2(max(-(-k // n), 1))))
    pad = n * k_loc - k
    if pad:
        # Identity rows (d=1, couplings/rhs 0) decouple exactly; PCR never
        # propagates real couplings into them (the last real row's upper
        # coupling starts zero and stays zero inductively).
        d = jnp.concatenate([d, jnp.ones(shape[:-1] + (pad,), d.dtype)], axis=-1)
        zpad = jnp.zeros(shape[:-1] + (pad,), b.dtype)
        b = jnp.concatenate([b, zpad], axis=-1)
        up = jnp.concatenate([up, zpad], axis=-1)
        lo = jnp.concatenate([lo, zpad], axis=-1)

    ndim = b.ndim
    spec = P(*((batch_axis,) + (None,) * (ndim - 2) + (axis,)))
    f = jax.shard_map(
        partial(_dist_pcr, axis=axis, k_loc=k_loc, n_shards=n),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
    )
    x = f(b, up, lo, d)
    return x[..., :k] if pad else x
