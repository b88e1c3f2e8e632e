"""Sequence-sharded tridiagonal solve: substructuring (SPIKE) + distributed PCR.

The natural-cubic fit's tridiagonal systems have length = the time dimension
(reference misc.py:13-67 runs them on one device); for very long series
(SURVEY.md section 5(b)) the length axis itself must shard across the mesh.
Two formulations, both inside ``jax.shard_map``:

* ``method="spike"`` (default) — the substructuring / partition method: each
  shard drops its two boundary couplings, solves its LOCAL system for three
  right-hand sides at once (the particular solution and the two boundary
  "spikes"; one batched tridiagonal solve — the Pallas PCR+Thomas kernel on
  TPU), ``all_gather``s six boundary scalars per batch row, solves the tiny
  2(n_shards-1) interface system redundantly on every shard, and combines in
  one elementwise pass.  HBM sees the shard a handful of times total,
  versus log2(global length) full passes for distributed PCR, and the
  collective traffic is O(batch * n_shards) scalars riding ICI.

* ``method="pcr"`` — distributed parallel cyclic reduction: every elimination
  level is local elementwise work plus a halo exchange (``ppermute`` of an
  s-row boundary strip while the stride s is smaller than the local chunk, a
  whole-chunk ``ppermute`` once it exceeds it).  Requires the local chunk
  length to be a power of two; the wrapper pads with identity rows, which
  provably never couple into real rows.  Kept for unconditional stability on
  systems whose substructured blocks could be ill-conditioned (the
  natural-cubic systems are diagonally dominant, so SPIKE is safe there).
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


def _local_tridiagonal(rhs, up_off, d, lo_off):
    """Per-shard dense solve: the Pallas PCR+Thomas kernel on TPU (shard_map
    gives per-device code, so the multi-device decline rule of the public
    dispatcher does not apply), the XLA Thomas scan elsewhere."""
    if jax.default_backend() == "tpu":
        from ..ops.tridiagonal_pallas import tridiagonal_solve_pallas

        return tridiagonal_solve_pallas(rhs, up_off, d, lo_off)
    from ..ops.tridiagonal import tridiagonal_solve_thomas

    return tridiagonal_solve_thomas(rhs, up_off, d, lo_off)


def _spike_local(b, up, lo, d, *, axis, n_shards):
    """Local substructuring body: arrays (..., m) holding this shard's rows.

    Drops the two couplings that cross the shard boundary, solves the local
    system for (particular, left-spike, right-spike) in one batched call,
    assembles and redundantly solves the 2(n_shards-1) interface system from
    all_gather'd boundary values, and combines.  Wang's partition method /
    SPIKE specialised to the tridiagonal batched case."""
    m = b.shape[-1]
    lo0 = lo[..., :1]    # couples local row 0 to the left neighbour's last row
    upm = up[..., -1:]   # couples local row m-1 to the right neighbour's row 0
    lo_in = lo.at[..., 0].set(0.0)
    up_in = up.at[..., -1].set(0.0)

    e0 = jnp.zeros_like(b).at[..., 0].set(1.0) * lo0
    em = jnp.zeros_like(b).at[..., -1].set(1.0) * upm
    rhs = jnp.stack([b, e0, em], axis=0)  # (3, ..., m): one solve, three rhs
    sol = _local_tridiagonal(rhs, up_in[..., :-1], d, lo_in[..., 1:])
    xp, xl, xr = sol[0], sol[1], sol[2]

    if n_shards == 1:
        return xp

    # Interface data per shard: [xp0, xpm, xl0, xlm, xr0, xrm].
    iface = jnp.stack(
        [xp[..., 0], xp[..., -1], xl[..., 0], xl[..., -1],
         xr[..., 0], xr[..., -1]], axis=-1)
    allif = jax.lax.all_gather(iface, axis)  # (n, ..., 6)

    # Reduced system over y = [R_0, L_1, R_1, L_2, ..., L_{n-1}] where
    # L_j = x[first row of shard j], R_j = x[last row of shard j]:
    #   R_j + xlm_j R_{j-1} + xrm_j L_{j+1} = xpm_j      (j = 0..n-2)
    #   L_j + xl0_j R_{j-1} + xr0_j L_{j+1} = xp0_j      (j = 1..n-1)
    # with R_{-1} = L_n = 0.  Bandwidth-2, size 2(n-1): solved densely,
    # batched, identically on every shard (no second collective).
    nI = 2 * (n_shards - 1)
    batch = b.shape[:-1]
    M = jnp.broadcast_to(jnp.eye(nI, dtype=b.dtype), batch + (nI, nI))
    g = jnp.zeros(batch + (nI,), b.dtype)
    for j in range(n_shards - 1):        # R_j rows at position 2j
        r = 2 * j
        if j >= 1:
            M = M.at[..., r, 2 * (j - 1)].set(allif[j, ..., 3])  # xlm_j
        M = M.at[..., r, 2 * j + 1].set(allif[j, ..., 5])        # xrm_j
        g = g.at[..., r].set(allif[j, ..., 1])                   # xpm_j
    for j in range(1, n_shards):         # L_j rows at position 2j - 1
        r = 2 * j - 1
        M = M.at[..., r, 2 * j - 2].set(allif[j, ..., 2])        # xl0_j
        if j <= n_shards - 2:
            M = M.at[..., r, 2 * j + 1].set(allif[j, ..., 4])    # xr0_j
        g = g.at[..., r].set(allif[j, ..., 0])                   # xp0_j
    y = jnp.linalg.solve(M, g[..., None])[..., 0]

    me = jax.lax.axis_index(axis)
    idxR = jnp.clip(2 * (me - 1), 0, nI - 1)
    idxL = jnp.clip(2 * me + 1, 0, nI - 1)
    r_prev = jnp.where(me >= 1, jnp.take(y, idxR, axis=-1), 0.0)
    l_next = jnp.where(me <= n_shards - 2, jnp.take(y, idxL, axis=-1), 0.0)
    return xp - xl * r_prev[..., None] - xr * l_next[..., None]


def tridiagonal_solve_seq_sharded(
    b, A_upper, A_diagonal, A_lower, mesh, axis="model", batch_axis=None,
    method="spike",
):
    """Solves Ax = b with the length axis sharded over ``mesh`` axis ``axis``.

    Same system convention and broadcast semantics as
    ``ops.tridiagonal.tridiagonal_solve`` (reference misc.py:31-38); use
    ``batch_axis`` to additionally shard the leading batch dimension (e.g.
    ``axis="model", batch_axis="data"`` on a (data, model) mesh).
    ``method``: "spike" (substructuring; local Pallas solves + a tiny
    interface system — the fast path, safe for diagonally-dominant systems
    like the natural-cubic fit's) or "pcr" (distributed cyclic reduction —
    unconditionally stable; pass it explicitly for systems that are not
    diagonally dominant, where SPIKE's decoupled local blocks could be
    ill-conditioned).
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
    if method == "spike":
        k_loc = -(-k // n)
    elif method == "pcr":
        # PCR needs power-of-two local chunks so every stride at or above
        # the chunk lands on whole devices.
        k_loc = 1 << int(np.ceil(np.log2(max(-(-k // n), 1))))
    else:
        raise ValueError(f"Unrecognised method={method!r}; expected 'spike' or 'pcr'")
    pad = n * k_loc - k
    if pad:
        # Identity rows (d=1, couplings/rhs 0) decouple exactly; neither
        # formulation propagates real couplings into them (the last real
        # row's upper coupling starts zero and stays zero inductively).
        d = jnp.concatenate([d, jnp.ones(shape[:-1] + (pad,), d.dtype)], axis=-1)
        zpad = jnp.zeros(shape[:-1] + (pad,), b.dtype)
        b = jnp.concatenate([b, zpad], axis=-1)
        up = jnp.concatenate([up, zpad], axis=-1)
        lo = jnp.concatenate([lo, zpad], axis=-1)

    ndim = b.ndim
    spec = P(*((batch_axis,) + (None,) * (ndim - 2) + (axis,)))
    if method == "spike":
        body = partial(_spike_local, axis=axis, n_shards=n)
    else:
        body = partial(_dist_pcr, axis=axis, k_loc=k_loc, n_shards=n)
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        # The per-shard body dispatches a pallas_call on TPU, whose
        # ShapeDtypeStruct carries no varying-mesh-axes annotation; jax 0.9's
        # default check_vma=True rejects that combination outright.
        check_vma=False,
    )
    x = f(b, up, lo, d)
    return x[..., :k] if pad else x
