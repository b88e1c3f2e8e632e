"""Pallas TPU kernels: the whole NaN-masked natural-cubic fit, fused.

The masked fit (interpolation/cubic.py:_natural_cubic_coeffs_masked, mirroring
reference interpolation_cubic.py:78-167) is a chain of masked fills, a gappy
tridiagonal solve and elementwise algebra.  Run as separate ops it costs ~10
full-array HBM round trips plus a layout transpose inside every fill/solve
call.  Here the post-imputation fit is four streaming kernels over
length-major (k, n) blocks — one transpose in, none internal:

  K1 (reverse)  x, t, obs          -> hr, pds, six_pd_hr
                 next-observed (value, time) fill fused with the interval
                 quantities h = t_next - t, hr = 1/h, pds = 3 dx hr^2.
  K2 (forward)  hr, pds, obs       -> nd, nb
                 previous-observed fill (hr_prev, pds_prev) fused with the
                 diag/rhs assembly and the Thomas forward sweep, evaluated as
                 associative prefix scans (Mobius 2x2 for nd, affine for nb —
                 see ops/masked_tridiagonal_pallas.py for the derivation).
  K3 (reverse)  nd, nb, hr, sph, x_safe, obs -> a0, b0, two_c0, three_d0
                 back substitution (affine reverse prefix) fused with the
                 spline algebra; kd at the *next* observed knot is the scan
                 value one row later — no separate fill pass.
  K4 (forward)  a0, b0, two_c0, three_d0, t, obs -> a, b, two_c, three_d
                 last-observed-knot polynomial fill fused with the re-basing
                 onto every grid interval (the reference's sequential walk at
                 interpolation_cubic.py:147-162).

Every sequential recurrence is a Hillis–Steele pass over VMEM rows with the
running state carried across blocks in scratch; HBM sees each array once per
kernel.  Gradients: interpolation/cubic.py wraps this in a custom_vjp whose
backward differentiates the (numerically identical) XLA pipeline.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows (length axis) per block, per kernel.  Each Hillis-Steele level costs a
# full-block roll+select regardless of kb, so per-element scan work scales
# with log2(kb) and SMALLER blocks win until grid-step overhead bites
# (measured on a v5e at 8192x4096: K2 4.77 ms at kb=128 -> 3.63 ms at kb=32,
# worse again at 16; K3/K4 already sit at the pure-DMA copy floor at 128;
# see benchmarks/profile_fit_stages.py).  K1's batch-major input block is
# (wb, kb) with kb on the LANE axis, so it is pinned to multiples of 128;
# the length-major kernels only need sublane multiples of 8.  The length
# padding unit _KB must be a common multiple of all four.  The hot scans in
# K2 additionally run over _SUB_ASSEMBLE-row slices inside the block (see
# below), so its block stays at the DMA-friendly 128.
_KB = 128
_KB_ASSEMBLE = 128


def _rows(kb, wb):
    return jax.lax.broadcasted_iota(jnp.int32, (kb, wb), 0)


def _fill_block(vals, flag, reverse):
    """In-block inclusive masked fill: each row takes the nearest flagged
    row's values at-or-before it (at-or-after when reverse).  Rows with no
    flagged row in range keep their own entries.  flag is float (>0.5)."""
    kb, wb = flag.shape
    rows = _rows(kb, wb)
    s = 1
    while s < kb:
        if reverse:
            keep = rows < kb - s
            sh = lambda x, _s=s: pltpu.roll(x, kb - _s, axis=0)
        else:
            keep = rows >= s
            sh = lambda x, _s=s: pltpu.roll(x, _s, axis=0)
        take_self = flag > 0.5
        vals = [jnp.where(take_self | ~keep, v, sh(v)) for v in vals]
        flag = jnp.where(keep, jnp.maximum(flag, sh(flag)), flag)
        s *= 2
    return vals, flag


def _shift_after(v, carry, kb, wb):
    """Row i <- v[i + 1]; the last row takes the carry (entering from the
    block processed previously in a reverse stream)."""
    last = _rows(kb, wb) == kb - 1
    return jnp.where(last, carry, pltpu.roll(v, kb - 1, axis=0))


def _shift_before(v, carry, kb, wb):
    """Row i <- v[i - 1]; the first row takes the carry."""
    first = _rows(kb, wb) == 0
    return jnp.where(first, carry, pltpu.roll(v, 1, axis=0))


# --------------------------------------------------------------------------
# K1: next-observed fill + interval quantities (reverse stream)
# --------------------------------------------------------------------------


def _prep_body(x, t, obsf, hr_ref, pds_ref, sph_ref, cx, ct, cf, sub=None):
    """Shared K1 math: next-observed fill + interval quantities, given the
    in-VMEM (kb, wb) observed-values block, times and float mask.  The scans
    run over (sub, wb) slices back-to-front with local carry folds (see
    _SUB_ASSEMBLE's rationale)."""
    kb, wb = x.shape
    sub = min(sub or _SUB_PREP, kb)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        cx[:, :] = jnp.zeros((1, wb), x.dtype)
        ct[:, :] = jnp.zeros((1, wb), x.dtype)
        cf[:, :] = jnp.zeros((1, wb), x.dtype)

    cxv, ctv, cfv = cx[:, :], ct[:, :], cf[:, :]
    for j in reversed(range(kb // sub)):
        sl = pl.ds(j * sub, sub)
        xj = x[j * sub : (j + 1) * sub, :]
        tj = t[j * sub : (j + 1) * sub, :]
        oj = obsf[j * sub : (j + 1) * sub, :]

        (xin, tin), flin = _fill_block([xj, tj], oj, reverse=True)
        xin = jnp.where(flin > 0.5, xin, cxv)
        tin = jnp.where(flin > 0.5, tin, ctv)
        ftot = jnp.maximum(flin, cfv)

        xn = _shift_after(xin, cxv, sub, wb)
        tn = _shift_after(tin, ctv, sub, wb)
        f_after = _shift_after(ftot, cfv, sub, wb)

        has_next = (oj > 0.5) & (f_after > 0.5)
        h = tn - tj
        hr = jnp.where(has_next,
                       1.0 / jnp.where(has_next, h, jnp.ones_like(h)), 0.0)
        sph = 6.0 * (xn - xj) * hr
        pds = 0.5 * sph * hr

        hr_ref[sl, :] = hr
        pds_ref[sl, :] = pds
        sph_ref[sl, :] = sph
        cxv = xin[:1, :]
        ctv = tin[:1, :]
        cfv = ftot[:1, :]

    cx[:, :] = cxv
    ct[:, :] = ctv
    cf[:, :] = cfv


def _prep_kernel(x_ref, t_ref, obs_ref, hr_ref, pds_ref, sph_ref, cx, ct, cf,
                 sub=None):
    kb, wb = x_ref.shape
    t = jnp.broadcast_to(t_ref[:, :], (kb, wb))
    _prep_body(x_ref[:, :], t, obs_ref[:, :], hr_ref, pds_ref, sph_ref,
               cx, ct, cf, sub=sub)


def _prep_kernel_bm(x_ref, t_ref, sc_ref, hr_ref, pds_ref, sph_ref,
                    xs_ref, obs_ref, cx, ct, cf, *, version, sub=None):
    """K1 over a batch-major raw-values block: in-kernel layout transpose,
    NaN masking and endpoint imputation (interpolation_cubic.py:101-131),
    then the shared interval math.  Also emits the length-major xs / obs
    blocks the downstream kernels consume, so the full-grid arrays never
    make a separate XLA transpose or imputation pass."""
    wb, kb = x_ref.shape
    xb = x_ref[:, :].T  # (kb, wb) length-major
    t = jnp.broadcast_to(t_ref[:, :], (kb, wb))
    raw_obs = ~(xb != xb)

    first_t = sc_ref[0:1, :]
    last_t = sc_ref[1:2, :]
    v_first = sc_ref[2:3, :]
    v_last = sc_ref[3:4, :]
    tg0 = sc_ref[4:5, :]
    tg1 = sc_ref[5:6, :]
    if version == 0:
        # Impute only the first/last grid entry with the nearest observation.
        imp_lead = t == tg0
        imp_trail = t == tg1
    else:
        # Fill forward/backward from the first/last observation; interior
        # NaNs stay missing.  Padded rows (t > tg1) stay unobserved.
        imp_lead = t < first_t
        imp_trail = (t > last_t) & (t <= tg1)
    x = jnp.where(raw_obs, xb,
                  jnp.where(imp_lead, jnp.broadcast_to(v_first, (kb, wb)),
                            jnp.broadcast_to(v_last, (kb, wb))))
    obs = raw_obs | imp_lead | imp_trail
    xs = jnp.where(obs, x, jnp.zeros_like(x))
    obsf = obs.astype(xb.dtype)

    xs_ref[:, :] = xs
    obs_ref[:, :] = obsf
    _prep_body(xs, t, obsf, hr_ref, pds_ref, sph_ref, cx, ct, cf, sub=sub)


# --------------------------------------------------------------------------
# K2: previous-observed fill + system assembly + Thomas forward sweep
# --------------------------------------------------------------------------


def _matmul2(a00, a01, a10, a11, b00, b01, b10, b11):
    return (
        a00 * b00 + a01 * b10,
        a00 * b01 + a01 * b11,
        a10 * b00 + a11 * b10,
        a10 * b01 + a11 * b11,
    )


def _rescale2(m00, m01, m10, m11):
    s = 1.0 / jnp.maximum(
        jnp.maximum(jnp.abs(m00), jnp.abs(m01)),
        jnp.maximum(jnp.maximum(jnp.abs(m10), jnp.abs(m11)), 1e-30),
    )
    return m00 * s, m01 * s, m10 * s, m11 * s


# In-kernel scan granularity: each Hillis-Steele level is a full-array
# roll+select, so running the prefix scans over (sub, wb) slices with local
# (1, wb) carry folds between them does log2(sub) levels of 1/(kb/sub)-size
# work instead of log2(kb) full-size levels — the same carry chaining the
# grid already does across blocks, moved inside the block where it costs no
# DMA or grid overhead.  8 is the f32 sublane tile, the natural floor.
_SUB_ASSEMBLE = 8
_SUB_PREP = 8


def _assemble_fwd_kernel(hr_ref, pds_ref, obs_ref, nd_ref, nb_ref,
                         chf, cpf, cff, cp_ref, cq_ref, cb_ref, sub=None):
    kb, wb = hr_ref.shape
    sub = min(sub or _SUB_ASSEMBLE, kb)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        chf[:, :] = jnp.zeros((1, wb), hr_ref.dtype)
        cpf[:, :] = jnp.zeros((1, wb), hr_ref.dtype)
        cff[:, :] = jnp.zeros((1, wb), hr_ref.dtype)
        cp_ref[:, :] = jnp.ones((1, wb), hr_ref.dtype)
        cq_ref[:, :] = jnp.ones((1, wb), hr_ref.dtype)
        cb_ref[:, :] = jnp.zeros((1, wb), hr_ref.dtype)

    ch, cpd, cf = chf[:, :], cpf[:, :], cff[:, :]
    cp, cq, cb = cp_ref[:, :], cq_ref[:, :], cb_ref[:, :]
    rows = _rows(sub, wb)

    for j in range(kb // sub):
        sl = pl.ds(j * sub, sub)
        hr = hr_ref[sl, :]
        pds = pds_ref[sl, :]
        obsf = obs_ref[sl, :]
        obs = obsf > 0.5

        (hrin, pdin), flin = _fill_block([hr, pds], obsf, reverse=False)
        hrin = jnp.where(flin > 0.5, hrin, ch)
        pdin = jnp.where(flin > 0.5, pdin, cpd)
        ftot = jnp.maximum(flin, cf)

        hp = _shift_before(hrin, ch, sub, wb)
        pds_prev = _shift_before(pdin, cpd, sub, wb)

        d = 2.0 * (hp + hr)
        d = jnp.where(obs & (d > 0), d, jnp.ones_like(d))
        r = pds_prev + pds

        # --- nd via 2x2 Mobius prefix products (masked_tridiagonal_pallas) -
        c = hp * hp
        m00 = jnp.where(obs, d, 1.0)
        m01 = jnp.where(obs, -c, 0.0)
        m10 = jnp.where(obs, jnp.ones_like(d), 0.0)
        m11 = jnp.where(obs, jnp.zeros_like(d), 1.0)

        s = 1
        while s < sub:
            keep = rows >= s
            b00 = jnp.where(keep, pltpu.roll(m00, s, axis=0), 1.0)
            b01 = jnp.where(keep, pltpu.roll(m01, s, axis=0), 0.0)
            b10 = jnp.where(keep, pltpu.roll(m10, s, axis=0), 0.0)
            b11 = jnp.where(keep, pltpu.roll(m11, s, axis=0), 1.0)
            m00, m01, m10, m11 = _matmul2(m00, m01, m10, m11, b00, b01, b10, b11)
            m00, m01, m10, m11 = _rescale2(m00, m01, m10, m11)
            s *= 2

        p = m00 * cp + m01 * cq
        q = m10 * cp + m11 * cq
        scale = 1.0 / jnp.maximum(jnp.maximum(jnp.abs(p), jnp.abs(q)), 1e-30)
        p = p * scale
        q = q * scale
        nd = p / jnp.where(q == 0, 1e-30, q)

        first = rows < 1
        p_prev = jnp.where(first, cp, pltpu.roll(p, 1, axis=0))
        q_prev = jnp.where(first, cq, pltpu.roll(q, 1, axis=0))
        nd_prev = p_prev / jnp.where(q_prev == 0, 1e-30, q_prev)

        # --- nb via affine prefix -------------------------------------------
        A = jnp.where(obs, r, 0.0)
        B = jnp.where(obs, -hp / jnp.where(nd_prev == 0, 1e-30, nd_prev),
                      jnp.ones_like(d))
        s = 1
        while s < sub:
            keep = rows >= s
            A_sh = jnp.where(keep, pltpu.roll(A, s, axis=0), 0.0)
            B_sh = jnp.where(keep, pltpu.roll(B, s, axis=0), 1.0)
            A, B = A + B * A_sh, B * B_sh
            s *= 2
        nb = A + B * cb

        nd_ref[sl, :] = jnp.where(obs, nd, 1.0)
        nb_ref[sl, :] = jnp.where(obs, nb, 0.0)

        ch = hrin[sub - 1 :, :]
        cpd = pdin[sub - 1 :, :]
        cf = ftot[sub - 1 :, :]
        cp = p[sub - 1 :, :]
        cq = q[sub - 1 :, :]
        cb = nb[sub - 1 :, :]

    chf[:, :] = ch
    cpf[:, :] = cpd
    cff[:, :] = cf
    cp_ref[:, :] = cp
    cq_ref[:, :] = cq
    cb_ref[:, :] = cb


# --------------------------------------------------------------------------
# K3: back substitution + spline algebra (reverse stream)
# --------------------------------------------------------------------------


def _subst_kernel(nd_ref, nb_ref, hr_ref, sph_ref, xs_ref, obs_ref,
                  a_ref, b_ref, c_ref, d_ref, cu):
    kb, wb = nd_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _init():
        cu[:, :] = jnp.zeros((1, wb), nd_ref.dtype)

    nd = nd_ref[:, :]
    nb = nb_ref[:, :]
    hr = hr_ref[:, :]
    sph = sph_ref[:, :]
    xs = xs_ref[:, :]
    obs = obs_ref[:, :] > 0.5

    # x_i = A_i + B_i x_{i+1}; missing rows pass the carry through.
    nd_safe = jnp.where(nd == 0, 1e-30, nd)
    A = jnp.where(obs, nb / nd_safe, 0.0)
    B = jnp.where(obs, -hr / nd_safe, jnp.ones_like(nd))

    rows = _rows(kb, wb)
    s = 1
    while s < kb:
        keep = rows < kb - s
        A_sh = jnp.where(keep, pltpu.roll(A, kb - s, axis=0), 0.0)
        B_sh = jnp.where(keep, pltpu.roll(B, kb - s, axis=0), 1.0)
        A, B = A + B * A_sh, B * B_sh
        s *= 2
    u = A + B * cu[:, :]

    kd = jnp.where(obs, u, 0.0)
    kdn = _shift_after(u, cu[:, :], kb, wb)  # kd at the next observed knot

    a_ref[:, :] = xs
    b_ref[:, :] = kd
    c_ref[:, :] = (sph - 4.0 * kd - 2.0 * kdn) * hr
    d_ref[:, :] = (-sph + 3.0 * (kd + kdn)) * hr * hr
    cu[:, :] = u[:1, :]


# --------------------------------------------------------------------------
# K4: last-observed polynomial fill + re-basing (forward stream)
# --------------------------------------------------------------------------


def _rebase_kernel(a_ref, b_ref, c_ref, d_ref, t_ref, obs_ref,
                   ao_ref, bo_ref, co_ref, do_ref, ca, cb, cc, cd, ct, cf,
                   transpose_out=False):
    kb, wb = a_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _init():
        # Unobserved prefixes take the global first row (the XLA fill's scan
        # identity keeps element 0's entries).
        ca[:, :] = a_ref[:1, :]
        cb[:, :] = b_ref[:1, :]
        cc[:, :] = c_ref[:1, :]
        cd[:, :] = d_ref[:1, :]
        ct[:, :] = jnp.broadcast_to(t_ref[:1, :], (1, wb))
        cf[:, :] = jnp.zeros((1, wb), a_ref.dtype)

    a0 = a_ref[:, :]
    b0 = b_ref[:, :]
    c0 = c_ref[:, :]
    d0 = d_ref[:, :]
    t = jnp.broadcast_to(t_ref[:, :], (kb, wb))
    obsf = obs_ref[:, :]

    (ain, bin_, cin, din, tin), flin = _fill_block(
        [a0, b0, c0, d0, t], obsf, reverse=False
    )
    seen = flin > 0.5
    a_k = jnp.where(seen, ain, ca[:, :])
    b_k = jnp.where(seen, bin_, cb[:, :])
    c_k = jnp.where(seen, cin, cc[:, :])
    d_k = jnp.where(seen, din, cd[:, :])
    t_obs = jnp.where(seen, tin, ct[:, :])
    ftot = jnp.maximum(flin, cf[:, :])

    offset = t_obs - t
    ao = a_k + ((0.5 * c_k - d_k * offset / 3.0) * offset - b_k) * offset
    bo = b_k + (d_k * offset - c_k) * offset
    co = c_k - 2.0 * d_k * offset
    do = d_k
    if transpose_out:
        # Batch-major outputs: the layout transpose happens on the VMEM
        # block, so the coefficient arrays hit HBM once, already in the
        # caller's (..., length) layout.
        ao_ref[:, :] = ao.T
        bo_ref[:, :] = bo.T
        co_ref[:, :] = co.T
        do_ref[:, :] = do.T
    else:
        ao_ref[:, :] = ao
        bo_ref[:, :] = bo
        co_ref[:, :] = co
        do_ref[:, :] = do

    ca[:, :] = a_k[kb - 1 :, :]
    cb[:, :] = b_k[kb - 1 :, :]
    cc[:, :] = c_k[kb - 1 :, :]
    cd[:, :] = d_k[kb - 1 :, :]
    ct[:, :] = t_obs[kb - 1 :, :]
    cf[:, :] = ftot[kb - 1 :, :]


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------


def _specs(k, n, kb, wb, t=False, reverse=False):
    nk = k // kb
    if reverse:
        if t:
            return pl.BlockSpec((kb, 1), lambda w, kk, _nk=nk: (_nk - 1 - kk, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((kb, wb), lambda w, kk, _nk=nk: (_nk - 1 - kk, w),
                            memory_space=pltpu.VMEM)
    if t:
        return pl.BlockSpec((kb, 1), lambda w, kk: (kk, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((kb, wb), lambda w, kk: (kk, w), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret", "kb", "sub"))
def _fit_2d(xs, tcol, obs, interpret=False, kb=None, sub=None):
    """Fused masked fit on length-major (k, n) arrays; k % kb == 0.

    xs: observed values (zeros at missing); tcol: (k, 1) times; obs: float
    observed mask.  Returns (a, b, two_c, three_d), each (k, n) full-grid.
    """
    k, n = xs.shape
    kb1 = kb or _KB
    kb2 = kb or _KB_ASSEMBLE
    if sub is None and interpret:
        # One in-kernel slice: interpret-mode op count stays sane.
        sub1, sub2 = kb1, kb2
    else:
        sub1 = sub2 = sub
    dt = xs.dtype

    def run(kernel, n_out, n_carry, wb, reverse, args, kbr):
        grid = (n // wb, k // kbr)
        spec = _specs(k, n, kbr, wb, reverse=reverse)
        tspec = _specs(k, n, kbr, wb, t=True, reverse=reverse)
        in_specs = [tspec if a is tcol else spec for a in args]
        carry = pltpu.VMEM((1, wb), dt)
        shape = jax.ShapeDtypeStruct((k, n), dt)
        return pl.pallas_call(
            kernel,
            out_shape=tuple([shape] * n_out) if n_out > 1 else shape,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple([spec] * n_out) if n_out > 1 else spec,
            scratch_shapes=[carry] * n_carry,
            interpret=interpret,
        )(*args)

    hr, pds, sph = run(partial(_prep_kernel, sub=sub1), 3, 3, 256, True,
                       (xs, tcol, obs), kb1)
    nd, nb = run(partial(_assemble_fwd_kernel, sub=sub2), 2, 6, 256, False,
                 (hr, pds, obs), kb2)
    a0, b0, c0, d0 = run(_subst_kernel, 4, 1, 256, True,
                         (nd, nb, hr, sph, xs, obs), kb1)
    a, b, c, d = run(_rebase_kernel, 4, 6, 128, False,
                     (a0, b0, c0, d0, tcol, obs), kb1)
    return a, b, c, d


@partial(jax.jit, static_argnames=("version", "interpret", "kb", "sub"))
def _fit_2d_bm(xbm, tcol, slab, version, interpret=False, kb=None, sub=None):
    """Fused masked fit from a batch-major (n, k) raw-values array (NaNs
    intact, pre-imputation); k % kb == 0, n % 256 == 0.

    tcol: (k, 1) times; slab: (8, n) per-row endpoint scalars
    [first_t, last_t, v_first, v_last, t_grid_first, t_grid_last, 0, 0].
    Returns (a, b, two_c, three_d), each batch-major (n, k) full-grid.
    """
    n, k = xbm.shape
    kb1 = kb or _KB
    kb2 = kb or _KB_ASSEMBLE
    if sub is None and interpret:
        # One in-kernel slice: interpret-mode op count stays sane.
        sub1, sub2 = kb1, kb2
    else:
        sub1 = sub2 = sub
    dt = xbm.dtype

    def run(kernel, in_specs, out_specs, n_out, n_carry, wb, args, kbr):
        grid = (n // wb, k // kbr)
        carry = pltpu.VMEM((1, wb), dt)
        shape = jax.ShapeDtypeStruct((k, n), dt)
        return pl.pallas_call(
            kernel,
            out_shape=tuple([shape] * n_out) if n_out > 1 else shape,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs) if n_out > 1 else out_specs[0],
            scratch_shapes=[carry] * n_carry,
            interpret=interpret,
        )(*args)

    nk1 = k // kb1

    def bm_spec(wb, reverse=False):
        # Batch-major (wb, kb1) blocks: kb1 rides the lane axis, so K1/K4
        # are pinned to kb1 (lane multiples of 128).
        if reverse:
            return pl.BlockSpec((wb, kb1), lambda w, kk, _nk=nk1: (w, _nk - 1 - kk),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((wb, kb1), lambda w, kk: (w, kk),
                            memory_space=pltpu.VMEM)

    def slab_spec(wb):
        return pl.BlockSpec((8, wb), lambda w, kk: (0, w),
                            memory_space=pltpu.VMEM)

    wb1 = 256
    spec1 = _specs(k, n, kb1, wb1, reverse=True)
    hr, pds, sph, xs, obs = run(
        partial(_prep_kernel_bm, version=version, sub=sub1),
        [bm_spec(wb1, reverse=True), _specs(k, n, kb1, wb1, t=True, reverse=True),
         slab_spec(wb1)],
        [spec1] * 5, 5, 3, wb1, (xbm, tcol, slab), kb1)

    spec2 = _specs(k, n, kb2, 256)
    nd, nb = run(partial(_assemble_fwd_kernel, sub=sub2), [spec2] * 3,
                 [spec2] * 2, 2, 6, 256, (hr, pds, obs), kb2)

    spec3 = _specs(k, n, kb1, 256, reverse=True)
    a0, b0, c0, d0 = run(_subst_kernel, [spec3] * 6, [spec3] * 4, 4, 1, 256,
                         (nd, nb, hr, sph, xs, obs), kb1)

    wb4 = 128
    spec4 = _specs(k, n, kb1, wb4)
    tspec4 = _specs(k, n, kb1, wb4, t=True)
    grid4 = (n // wb4, k // kb1)
    bmshape = jax.ShapeDtypeStruct((n, k), dt)
    a, b, c, d = pl.pallas_call(
        partial(_rebase_kernel, transpose_out=True),
        out_shape=(bmshape,) * 4,
        grid=grid4,
        in_specs=[spec4] * 4 + [tspec4, spec4],
        out_specs=(bm_spec(wb4),) * 4,
        scratch_shapes=[pltpu.VMEM((1, wb4), dt)] * 6,
        interpret=interpret,
    )(a0, b0, c0, d0, tcol, obs)
    return a, b, c, d


def masked_natural_cubic_full(t, x, version, interpret=False, kb=None,
                              sub=None):
    """Whole NaN-masked natural-cubic fit from raw values, batch-major I/O.

    Unlike ``masked_natural_cubic_pallas`` (which takes post-imputation
    values and transposes to length-major around the kernels), this entry
    consumes x (..., length) exactly as the caller holds it — NaNs intact,
    batch-major layout — and performs the endpoint imputation
    (interpolation_cubic.py:101-131, _version 0/1), the masked fills, the
    gappy Thomas solve and the polynomial re-basing entirely inside the
    streaming kernels.  HBM reads x once on the way in and writes each
    coefficient array once on the way out; the five full-array layout
    transposes and the two imputation passes of the layered path disappear.
    All-NaN rows produce garbage (as does the XLA pipeline) — callers mask
    them with their any-observation predicate.

    Returns (a, b, two_c, three_d), each (..., length) full-grid rows
    (callers slice off the last row), numerically matching the XLA masked
    pipeline applied to endpoint-imputed values.

    When the whole time axis fits VMEM per batch tile, dispatches to the
    single-launch resident kernel (ops/masked_cubic_resident.py — 5 HBM
    array passes instead of this pipeline's 31; measured 6x at 8192x4096).
    Passing ``kb``/``sub`` or ``interpret`` pins the streaming pipeline.
    """
    from .pallas_dispatch import upcast_kernel_operands

    if not interpret and kb is None and sub is None:
        from .masked_cubic_resident import (
            _SB,
            masked_natural_cubic_resident,
            resident_tile,
        )

        k_padded = -(-x.shape[-1] // _SB) * _SB
        if resident_tile(k_padded) is not None:
            return masked_natural_cubic_resident(t, x, version)

    (x,), restore = upcast_kernel_operands(x)
    shape = x.shape
    k = shape[-1]
    x2 = x.reshape(-1, k)
    n = x2.shape[0]
    t = jnp.asarray(t, x2.dtype)

    # Per-row endpoint scalars for the in-kernel imputation: one cheap
    # reduction pass over the mask — the full-grid arrays never make a
    # dedicated XLA pass.
    obs0 = ~jnp.isnan(x2)
    first_idx = jnp.argmax(obs0, axis=-1)
    last_idx = (k - 1) - jnp.argmax(obs0[:, ::-1], axis=-1)
    v_first = jnp.take_along_axis(x2, first_idx[:, None], axis=-1)[:, 0]
    v_last = jnp.take_along_axis(x2, last_idx[:, None], axis=-1)[:, 0]
    first_t = t[first_idx]
    last_t = t[last_idx]
    ones = jnp.ones_like(first_t)
    slab = jnp.stack([
        first_t, last_t, v_first, v_last, t[0] * ones, t[k - 1] * ones,
        jnp.zeros_like(ones), jnp.zeros_like(ones),
    ])

    kpad = (-k) % (kb or _KB)
    npad = (-n) % 256
    if kpad or npad:
        # NaN-padded rows/columns stay unobserved pass-throughs in every
        # scan (version-1 trailing imputation stops at t_grid_last, so the
        # padded tail never becomes phantom knots); their outputs are
        # sliced off below.
        x2 = jnp.pad(x2, ((0, npad), (0, kpad)), constant_values=np.nan)
        slab = jnp.pad(slab, ((0, 0), (0, npad)))
    if kpad:
        extra = t[-1] + jnp.arange(1, kpad + 1, dtype=t.dtype)
        t = jnp.concatenate([t, extra])
    tcol = t.reshape(-1, 1)

    a, b, c, d = _fit_2d_bm(x2, tcol, slab, version, interpret=interpret,
                            kb=kb, sub=sub)
    out = []
    for arr in (a, b, c, d):
        arr = arr[:n, :k] if (kpad or npad) else arr
        out.append(restore(arr.reshape(shape)))
    return tuple(out)


def masked_natural_cubic_pallas(t, x, interpret=False, kb=None, sub=None):
    """Fused masked natural-cubic fit (TPU streaming kernels).

    t: (length,) strictly increasing times; x: (..., length) post-imputation
    values with NaNs at missing positions.  Returns (a, b, two_c, three_d),
    each (..., length) full-grid rows (callers slice off the last row) —
    numerically matching interpolation/cubic.py's XLA masked pipeline.
    """
    from .pallas_dispatch import upcast_kernel_operands

    (x,), restore = upcast_kernel_operands(x)
    shape = x.shape
    k = shape[-1]
    x2 = x.reshape(-1, k).T
    n = x2.shape[1]
    obs2 = (~jnp.isnan(x2)).astype(x2.dtype)
    xs2 = jnp.where(obs2 > 0.5, x2, jnp.zeros_like(x2))

    t = jnp.asarray(t, x2.dtype)
    kpad = (-k) % (kb or _KB)
    npad = (-n) % 256
    if kpad or npad:
        xs2 = jnp.pad(xs2, ((0, kpad), (0, npad)))
        obs2 = jnp.pad(obs2, ((0, kpad), (0, npad)))
    if kpad:
        # Padded times keep strictly increasing (never used: padded rows are
        # unobserved pass-throughs in every scan).
        extra = t[-1] + jnp.arange(1, kpad + 1, dtype=t.dtype)
        t = jnp.concatenate([t, extra])
    tcol = t.reshape(-1, 1)

    a, b, c, d = _fit_2d(xs2, tcol, obs2, interpret=interpret, kb=kb, sub=sub)
    out = []
    for arr in (a, b, c, d):
        arr = arr[:k, :n] if (kpad or npad) else arr
        out.append(restore(arr.T.reshape(shape)))
    return tuple(out)
