"""Sequence-sharded NaN-masked natural-cubic fit.

parallel/seq_pcr.py shards the DENSE tridiagonal solve over the mesh; this
module shards the full MASKED preprocessing pipeline
(interpolation/cubic.py:_masked_coeffs_xla — the replacement for the
reference's per-scalar recursion at
/root/reference/torchcde/interpolation_cubic.py:78-167) so series whose
length exceeds one device fit with the length axis across the mesh
(SURVEY.md section 5(b)).

Everything runs inside ONE ``jax.shard_map`` over length-sharded operands;
the communication pattern is:

* masked fills (select-combine associative scans) — one local scan plus a
  single ``all_gather`` of per-shard (carry, seen) summaries, combined in
  plain unrolled code (n_shards is static and small);
* element shifts — one-element halo ``ppermute`` to the neighbour shard;
* the gappy ("pass-through") tridiagonal solve — a SPIKE-style reduction:
  each shard solves THREE local systems (real rhs + unit responses to its
  two cross-boundary couplings) with the masked Thomas scan, all shards
  ``all_gather`` six boundary scalars, every device redundantly solves the
  tiny 2*n_shards interface system (dense, batched), and local solutions
  recombine affinely.  Empty shards (no observed rows — possible under
  heavy missingness) pass through exactly.

Collectives ride ICI neighbour links (halo) or are O(n_shards) scalars
(gathers); the length axis is never materialised on one device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _local_seen(observed, reverse=False):
    """Prefix (suffix) OR along the local length axis (last axis)."""
    return jax.lax.associative_scan(jnp.logical_or, observed,
                                    axis=observed.ndim - 1, reverse=reverse)


def _local_fill(values, observed, reverse=False):
    """Local masked fill via the differentiable dispatcher (ops.fill
    .masked_fill): analytic segment-sum VJP either way, and on single-chip
    TPU the per-shard fill runs as the streaming Pallas kernel instead of
    log2(n) associative-scan passes."""
    from ..ops.fill import masked_fill

    out = masked_fill(tuple(values), observed, axis=-1, reverse=reverse)
    return out if isinstance(out, tuple) else (out,)


def _shard_fill(values, observed, axis_name, n_shards, reverse=False):
    """Global masked fill across shards: local fill + one summary gather.

    Positions before the global first observation (after the last, when
    ``reverse``) keep their original entries, like masked_fill_scan.
    """
    filled = _local_fill(values, observed, reverse=reverse)
    seen = _local_seen(observed, reverse=reverse)
    any_local = seen[..., -1:] if not reverse else seen[..., :1]
    edge = -1 if not reverse else 0
    # Per-shard summary: (payloads at the shard's latest observation, flag).
    summaries = [f[..., edge:edge + 1] if edge == 0 else f[..., -1:]
                 for f in filled]
    me = jax.lax.axis_index(axis_name)

    gathered = [
        jax.lax.all_gather(s, axis_name)  # (n_shards, ..., 1)
        for s in summaries + [any_local.astype(filled[0].dtype)]
    ]
    *g_vals, g_flag = gathered

    # Exclusive combine over earlier (later, when reverse) shards, unrolled:
    # n_shards is a small static number.
    carry = [jnp.zeros_like(g[0]) for g in g_vals]
    carry_flag = jnp.zeros_like(g_flag[0])
    order = range(n_shards) if not reverse else range(n_shards - 1, -1, -1)
    incoming = [jnp.zeros_like(v[..., :1]) for v in filled]
    incoming_flag = jnp.zeros_like(any_local.astype(filled[0].dtype))
    for s in order:
        is_me = (me == s)
        incoming = [jnp.where(is_me, c, i) for c, i in zip(carry, incoming)]
        incoming_flag = jnp.where(is_me, carry_flag, incoming_flag)
        take = g_flag[s] > 0.5
        carry = [jnp.where(take, g[s], c) for g, c in zip(g_vals, carry)]
        carry_flag = jnp.maximum(carry_flag, g_flag[s])

    use_carry = (~seen) & (incoming_flag > 0.5)
    return tuple(jnp.where(use_carry, inc, f)
                 for inc, f in zip(incoming, filled))


def _shift_from_prev(x, axis_name, n_shards, fill=0.0):
    """Global x[i-1] (length-last): local shift + one-element halo."""
    halo = jax.lax.ppermute(x[..., -1:], axis_name,
                            [(j, j + 1) for j in range(n_shards - 1)])
    me = jax.lax.axis_index(axis_name)
    halo = jnp.where(me == 0, jnp.full_like(halo, fill), halo)
    return jnp.concatenate([halo, x[..., :-1]], axis=-1)


def _shift_from_next(x, axis_name, n_shards, fill=None, replicate_edge=False):
    """Global x[i+1]; the global last element takes ``fill`` (or replicates
    itself when ``replicate_edge``)."""
    halo = jax.lax.ppermute(x[..., :1], axis_name,
                            [(j, j - 1) for j in range(1, n_shards)])
    me = jax.lax.axis_index(axis_name)
    if replicate_edge:
        edge = x[..., -1:]
    else:
        edge = jnp.full_like(halo, fill)
    halo = jnp.where(me == n_shards - 1, edge, halo)
    return jnp.concatenate([x[..., 1:], halo], axis=-1)


def _reverse_count(observed, axis_name):
    """Number of observations at or after each position, globally."""
    local = jnp.cumsum(observed.astype(jnp.int32)[..., ::-1], axis=-1)[..., ::-1]
    total = jnp.sum(observed.astype(jnp.int32), axis=-1, keepdims=True)
    me = jax.lax.axis_index(axis_name)
    gathered = jax.lax.all_gather(total, axis_name)  # (n_shards, ..., 1)
    n_shards = gathered.shape[0]
    after = jnp.zeros_like(total)
    for s in range(n_shards):
        after = after + jnp.where(me < s, gathered[s], 0)
    return local + after


def _spike_gappy_solve(diag, rhs, hr, hr_prev, observed, axis_name, n_shards):
    """Distributed gappy Thomas: SPIKE reduction over the mesh.

    Same contract as interpolation.cubic._masked_thomas_observed, with the
    length axis sharded.  hr = coupling to the next observed row, hr_prev =
    coupling to the previous observed row (both zero when the neighbour does
    not exist globally).
    """
    from ..interpolation.cubic import _masked_thomas_observed

    obs_f = observed.astype(diag.dtype)
    seen_fwd = _local_seen(observed)
    seen_bwd = _local_seen(observed, reverse=True)
    is_first = observed & ~jnp.concatenate(
        [jnp.zeros_like(seen_fwd[..., :1]), seen_fwd[..., :-1]], axis=-1)
    is_last = observed & ~jnp.concatenate(
        [seen_bwd[..., 1:], jnp.zeros_like(seen_bwd[..., :1])], axis=-1)
    any_local = jnp.any(observed, axis=-1, keepdims=True)

    # Local system: interior couplings only — the boundary rows' couplings to
    # other shards move to the RHS as unit responses.
    lo_L = jnp.sum(jnp.where(is_first, hr_prev, 0.0), axis=-1, keepdims=True)
    up_R = jnp.sum(jnp.where(is_last, hr, 0.0), axis=-1, keepdims=True)
    hr_loc = jnp.where(is_last, 0.0, hr)
    hrp_loc = jnp.where(is_first, 0.0, hr_prev)

    e_L = jnp.where(is_first, lo_L, 0.0)
    e_R = jnp.where(is_last, up_R, 0.0)

    stacked_rhs = jnp.stack([rhs, e_L, e_R], axis=0)
    bcast = lambda a: jnp.broadcast_to(a, stacked_rhs.shape)
    # The differentiable dispatcher (custom_vjp): the streaming Pallas
    # kernel on single-chip TPU, the masked Thomas scan otherwise.
    from ..interpolation.cubic import _masked_solve

    sol = _masked_solve(
        bcast(diag), stacked_rhs, bcast(hr_loc), bcast(hrp_loc),
        jnp.broadcast_to(observed, stacked_rhs.shape))
    x_p, x_l, x_r = sol[0], sol[1], sol[2]

    def at(mask, x):
        return jnp.sum(jnp.where(mask, x, 0.0), axis=-1, keepdims=True)

    # Six boundary scalars per shard (plus the non-empty flag).
    scal = jnp.stack([
        at(is_first, x_p), at(is_last, x_p),
        at(is_first, x_l), at(is_last, x_l),
        at(is_first, x_r), at(is_last, x_r),
        any_local.astype(diag.dtype),
    ], axis=0)  # (7, ..., 1)
    g = jax.lax.all_gather(scal, axis_name)  # (n_shards, 7, ..., 1)

    # Redundant tiny interface solve on every device: unknowns
    # u = [xL_0, xR_0, ..., xL_{n-1}, xR_{n-1}] per batch element.
    m = 2 * n_shards
    batch_shape = diag.shape[:-1]
    eye = jnp.eye(m, dtype=diag.dtype)
    A = jnp.broadcast_to(eye, batch_shape + (m, m))
    bvec = jnp.zeros(batch_shape + (m,), diag.dtype)

    flags = [g[s, 6][..., 0] for s in range(n_shards)]  # (...,) each

    # prev/next non-empty shard links, as soft one-hots (static unroll).
    for s in range(n_shards):
        f_s = flags[s] > 0.5
        pLp, pRp, lLp, lRp, rLp, rRp = (g[s, q][..., 0] for q in range(6))
        bvec = bvec.at[..., 2 * s].add(jnp.where(f_s, pLp, 0.0))
        bvec = bvec.at[..., 2 * s + 1].add(jnp.where(f_s, pRp, 0.0))
        # find prev non-empty p < s: couple u[2s]+lL*u[2p+1] etc.
        taken = jnp.zeros_like(flags[s], dtype=bool)
        for p in range(s - 1, -1, -1):
            hit = (flags[p] > 0.5) & ~taken
            A = A.at[..., 2 * s, 2 * p + 1].add(
                jnp.where(f_s & hit, lLp, 0.0))
            A = A.at[..., 2 * s + 1, 2 * p + 1].add(
                jnp.where(f_s & hit, lRp, 0.0))
            taken = taken | (flags[p] > 0.5)
        taken = jnp.zeros_like(flags[s], dtype=bool)
        for q in range(s + 1, n_shards):
            hit = (flags[q] > 0.5) & ~taken
            A = A.at[..., 2 * s, 2 * q].add(jnp.where(f_s & hit, rLp, 0.0))
            A = A.at[..., 2 * s + 1, 2 * q].add(
                jnp.where(f_s & hit, rRp, 0.0))
            taken = taken | (flags[q] > 0.5)

    u = jnp.linalg.solve(A, bvec[..., None])[..., 0]  # (..., m)

    me = jax.lax.axis_index(axis_name)
    XL = jnp.zeros(batch_shape + (1,), diag.dtype)
    XR = jnp.zeros(batch_shape + (1,), diag.dtype)
    for s in range(n_shards):
        is_me = (me == s)
        # XL_s = xR of the previous non-empty shard; XR_s = xL of the next.
        xl_val = jnp.zeros(batch_shape, diag.dtype)
        taken = jnp.zeros_like(flags[s], dtype=bool)
        for p in range(s - 1, -1, -1):
            hit = (flags[p] > 0.5) & ~taken
            xl_val = jnp.where(hit, u[..., 2 * p + 1], xl_val)
            taken = taken | (flags[p] > 0.5)
        xr_val = jnp.zeros(batch_shape, diag.dtype)
        taken = jnp.zeros_like(flags[s], dtype=bool)
        for q in range(s + 1, n_shards):
            hit = (flags[q] > 0.5) & ~taken
            xr_val = jnp.where(hit, u[..., 2 * q], xr_val)
            taken = taken | (flags[q] > 0.5)
        XL = jnp.where(is_me, xl_val[..., None], XL)
        XR = jnp.where(is_me, xr_val[..., None], XR)

    x = x_p - XL * x_l - XR * x_r
    return x * obs_f


def _masked_coeffs_body(t_b, x, *, axis_name, n_shards):
    """The _masked_coeffs_xla pipeline with every length-axis dependence
    routed through the sharded primitives above.  Arrays (..., k_loc),
    length-minor; returns full-grid (a, b, two_c, three_d) rows."""
    observed = ~jnp.isnan(x)
    x_safe = jnp.where(observed, x, jnp.zeros_like(x))

    # Next observed (value, time) strictly after each position.
    xn_inc, tn_inc = _shard_fill((x_safe, t_b), observed, axis_name, n_shards,
                                 reverse=True)
    xn = _shift_from_next(xn_inc, axis_name, n_shards, replicate_edge=True)
    tn_shift = _shift_from_next(tn_inc, axis_name, n_shards,
                                replicate_edge=True)
    me = jax.lax.axis_index(axis_name)
    # sentinel on the global last element: t_last + 1 (no later observation)
    is_global_last = (me == n_shards - 1)
    last_col = jnp.zeros_like(tn_shift, dtype=bool).at[..., -1].set(True)
    tn = jnp.where(last_col & is_global_last, tn_inc + 1.0, tn_shift)

    later_obs = _reverse_count(observed, axis_name)
    has_next = observed & (later_obs > 1)

    h = tn - t_b
    hr = jnp.where(has_next, 1.0 / jnp.where(has_next, h, jnp.ones_like(h)),
                   0.0)
    six_pd_hr = 6 * (xn - x_safe) * hr
    pds = 0.5 * six_pd_hr * hr

    hr_f, pds_f = _shard_fill((hr, pds), observed, axis_name, n_shards)
    hr_prev = _shift_from_prev(hr_f, axis_name, n_shards)
    pds_prev = _shift_from_prev(pds_f, axis_name, n_shards)

    diag = 2 * (hr_prev + hr)
    diag = jnp.where(observed & (diag > 0), diag, jnp.ones_like(diag))
    rhs = pds_prev + pds

    kd = _spike_gappy_solve(diag, rhs, hr, hr_prev, observed, axis_name,
                            n_shards)

    (kdn_inc,) = _shard_fill((kd,), observed, axis_name, n_shards,
                             reverse=True)
    kdn = _shift_from_next(kdn_inc, axis_name, n_shards, replicate_edge=True)

    a0 = x_safe
    b0 = kd
    two_c0 = (six_pd_hr - 4 * kd - 2 * kdn) * hr
    three_d0 = (-six_pd_hr + 3 * (kd + kdn)) * hr * hr

    a_k, b_k, two_c_k, three_d_k, t_obs = _shard_fill(
        (a0, b0, two_c0, three_d0, t_b), observed, axis_name, n_shards)
    offset = t_obs - t_b

    a = a_k + ((0.5 * two_c_k - three_d_k * offset / 3) * offset - b_k) * offset
    b = b_k + (three_d_k * offset - two_c_k) * offset
    two_c = two_c_k - 2 * three_d_k * offset
    three_d = three_d_k
    return a, b, two_c, three_d


def natural_cubic_coeffs_seq_sharded(x, t, mesh, axis="model",
                                     batch_axis=None):
    """NaN-masked natural cubic coefficients with the LENGTH axis sharded.

    Same contract as ``natural_cubic_coeffs`` (x: (..., length, channels),
    optional 1-D t, _version=1 endpoint imputation, packed
    (..., length - 1, 4 * channels) output) with the time dimension split
    over ``mesh`` axis ``axis`` and the leading batch dim optionally over
    ``batch_axis``.  Length must divide by the number of shards.
    """
    from ..utils.misc import validate_input_path

    x = jnp.asarray(x)
    t = validate_input_path(x, t)
    n_shards = mesh.shape[axis]
    if n_shards == 1 and (batch_axis is None or mesh.shape[batch_axis] == 1):
        # A 1-shard mesh provides no parallelism to amortise SPIKE's
        # overhead (three local solves per shard + the interface system):
        # degrade to the single-device Pallas-backed masked fit, which has
        # the identical contract.  Measured on TPU v5e at 2048x4096x1 this
        # is the difference between 43 ms (SPIKE machinery on one shard)
        # and ~1.3 ms (streaming masked kernel).
        from ..interpolation.cubic import natural_cubic_coeffs

        return natural_cubic_coeffs(x, t)
    length = x.shape[-2]
    if length % n_shards:
        raise ValueError(
            f"length {length} must divide the number of length shards "
            f"{n_shards} (pad the series; identity rows are safe)"
        )

    xT = jnp.swapaxes(x, -1, -2)  # (..., C, L): length-minor
    t_arr = jnp.asarray(t).astype(xT.dtype)
    t_b = jnp.broadcast_to(t_arr, xT.shape)

    observed = ~jnp.isnan(xT)
    any_obs = jnp.any(observed, axis=-1, keepdims=True)

    ndim = xT.ndim
    spec = P(*((batch_axis,) + (None,) * (ndim - 2) + (axis,)))

    def body(t_loc, x_loc):
        obs = ~jnp.isnan(x_loc)
        # _version=1 endpoint imputation, sharded: before the first global
        # observation take the backward fill (== first observed value);
        # after the last, the forward fill.
        (x_f,) = _shard_fill(
            (jnp.where(obs, x_loc, jnp.zeros_like(x_loc)),), obs,
            axis, n_shards)
        (x_bwd,) = _shard_fill(
            (jnp.where(obs, x_loc, jnp.zeros_like(x_loc)),), obs,
            axis, n_shards, reverse=True)
        seen_before = _local_seen(obs)
        seen_after = _local_seen(obs, reverse=True)
        # Extend "seen" across shards via the fill flags: a position has an
        # observation before it iff the forward carry reaches it.
        gathered = jax.lax.all_gather(
            jnp.any(obs, axis=-1, keepdims=True), axis)
        me = jax.lax.axis_index(axis)
        before_shard = jnp.zeros_like(gathered[0])
        after_shard = jnp.zeros_like(gathered[0])
        for s in range(n_shards):
            before_shard = before_shard | jnp.where(me > s, gathered[s], False)
            after_shard = after_shard | jnp.where(me < s, gathered[s], False)
        seen_before = seen_before | before_shard
        seen_after = seen_after | after_shard
        xi = jnp.where(jnp.isnan(x_loc) & ~seen_before, x_bwd, x_loc)
        xi = jnp.where(jnp.isnan(xi) & ~seen_after, x_f, xi)
        return _masked_coeffs_body(t_loc, xi, axis_name=axis,
                                   n_shards=n_shards)

    f = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec),
        out_specs=(spec, spec, spec, spec),
        # See seq_pcr: pallas_call inside shard_map vs jax 0.9's check_vma.
        check_vma=False,
    )
    a, b, two_c, three_d = f(t_b, xT)

    zero = jnp.zeros_like(a)
    a = jnp.where(any_obs, a, zero)[..., :-1]
    b = jnp.where(any_obs, b, zero)[..., :-1]
    two_c = jnp.where(any_obs, two_c, zero)[..., :-1]
    three_d = jnp.where(any_obs, three_d, zero)[..., :-1]

    coeffs = jnp.stack([a, b, two_c, three_d], axis=-3)  # (..., 4, C, L-1)
    coeffs = jnp.moveaxis(coeffs, -1, -3)  # (..., L-1, 4, C)
    return coeffs.reshape(coeffs.shape[:-2] + (coeffs.shape[-2] * coeffs.shape[-1],))
