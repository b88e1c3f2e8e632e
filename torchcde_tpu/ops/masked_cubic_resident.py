"""Single-launch VMEM-resident NaN-masked natural-cubic fit.

The four streaming kernels in ops/masked_cubic_pallas.py alternate stream
direction (reverse/forward/reverse/forward), so no adjacent pair can fuse at
the grid level — run separately they cost 31 full-array HBM passes (16 reads
+ 15 writes; measured at the per-stage copy floor, benchmarks/
profile_fit_stages.py).  When the whole time axis fits VMEM for a batch tile,
this kernel runs all four phases in one launch over a batch-only grid: HBM
reads the raw values once and writes the four coefficient arrays once —
5 passes.  Everything between — imputation, masked fills, the gappy Thomas
solve, back substitution and the grid re-basing (mirroring the reference's
sequential walk, interpolation_cubic.py:78-167) — happens on VMEM-resident
length-major slabs.

Phase math is identical to the streaming kernels (same sub-slice prefix
scans, same carry folds — see masked_cubic_pallas.py's kernel docstrings);
only the carries live in a scratch row block instead of grid-carried scratch,
and phase D transposes each 128-row slice in VMEM before the batch-major
store.  The endpoint slab (first/last observed value and time per row, the
imputation sources) is computed in-kernel by a reduction pre-pass (Phase 0)
over the already-resident input block rather than by XLA argmax + gathers.
Scratch budget: 7 length-major (k, wb) slabs with in-place reuse (phase C
writes b0/c0/d0 over pds/nd/nb after their last read; a0 is xs itself) plus
two (8, wb) carry/slab row blocks, sized by ``resident_tile`` against the
120 MB scoped VMEM limit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masked_cubic_pallas import (
    _KB,
    _fill_block,
    _matmul2,
    _rescale2,
    _rows,
    _shift_after,
    _shift_before,
)

# Rows per resident slice: the lane-dynamic loads/stores on the batch-major
# refs must stay 128-aligned, and 128 matches the streaming kernels' block
# size so the carry fold order (and so rounding) is directly comparable.
_SB = 128

# VMEM bytes per (k, wb) f32 unit: 7 scratch slabs + double-buffered input
# window (1 array) + double-buffered output windows (4 arrays).
_VMEM_UNITS = 7 + 2 * 1 + 2 * 4
_VMEM_BUDGET = 100 * 1024 * 1024
_VMEM_LIMIT = 120 * 1024 * 1024


def resident_tile(k_padded):
    """Largest batch tile (lanes) the resident kernel can run at, or None
    when even the narrowest tile would blow the VMEM budget (callers pad the
    batch dim to a multiple of the returned tile)."""
    for wb in (256, 128):
        if _VMEM_UNITS * k_padded * wb * 4 <= _VMEM_BUDGET:
            return wb
    return None


def _resident_kernel(xbm_ref, t_ref, a_ref, b_ref, c_ref, d_ref,
                     xs, obs, hr, pds, sph, nd, nb, cr, slab,
                     *, k, k_orig, wb, sb, sub, version):
    ns = k // sb
    nsub = sb // sub
    dt = xs.dtype
    zrow = jnp.zeros((1, wb), dt)
    onerow = jnp.ones((1, wb), dt)

    # ---- Phase 0 (forward): per-lane endpoint reductions over the
    # VMEM-resident input block — first/last observed (value, time) per row,
    # replacing the XLA argmax + gather preamble (which cost ~1.2 ms of
    # latency-bound HBM passes at 8192x4096).  t is strictly increasing, so
    # the first/last observation is recovered exactly by a min/max over
    # observed times plus an equality-masked sum.  Defaults for rows with no
    # observation mirror the XLA preamble's argmax-of-all-False semantics:
    # first_t = t[0], last_t = t[k_orig-1], values NaN.
    tg0 = jnp.broadcast_to(t_ref[0:1, :], (1, wb))
    tg1 = jnp.broadcast_to(t_ref[k_orig - 1:k_orig, :], (1, wb))
    nanrow = jnp.full((1, wb), jnp.nan, dt)
    slab[0:1, :] = tg0      # first_t
    slab[1:2, :] = tg1      # last_t
    slab[2:3, :] = nanrow   # v_first
    slab[3:4, :] = nanrow   # v_last
    slab[4:5, :] = tg0
    slab[5:6, :] = tg1
    cr[0:1, :] = zrow       # seen-any-observation flag

    def body_0(i, _):
        rs = pl.ds(i * sb, sb)
        xb = xbm_ref[:, rs].T
        tb = jnp.broadcast_to(t_ref[rs, :], (sb, wb))
        ob = xb == xb
        inf = jnp.asarray(jnp.inf, dt)
        tfs = jnp.min(jnp.where(ob, tb, inf), axis=0, keepdims=True)
        tls = jnp.max(jnp.where(ob, tb, -inf), axis=0, keepdims=True)
        has = tfs < inf
        vfs = jnp.sum(jnp.where(ob & (tb == tfs), xb, 0.0), axis=0,
                      keepdims=True)
        vls = jnp.sum(jnp.where(ob & (tb == tls), xb, 0.0), axis=0,
                      keepdims=True)
        seen = cr[0:1, :]
        first_new = (seen < 0.5) & has
        slab[0:1, :] = jnp.where(first_new, tfs, slab[0:1, :])
        slab[2:3, :] = jnp.where(first_new, vfs, slab[2:3, :])
        slab[1:2, :] = jnp.where(has, tls, slab[1:2, :])
        slab[3:4, :] = jnp.where(has, vls, slab[3:4, :])
        cr[0:1, :] = jnp.maximum(seen, has.astype(dt))
        return 0

    jax.lax.fori_loop(0, ns, body_0, 0)

    # ---- Phase A (reverse): imputation + next-observed fill + interval
    # quantities (masked_cubic_pallas._prep_kernel_bm / _prep_body).
    # tg0/tg1 are re-loaded from the scratch rather than reusing the
    # broadcast-from-(1,1) values above: comparing those against (sb, wb)
    # rows would fuse into a both-dims broadcast Mosaic can't lower
    # ("Broadcast in both sublanes and lanes").
    first_t = slab[0:1, :]
    last_t = slab[1:2, :]
    v_first = slab[2:3, :]
    v_last = slab[3:4, :]
    tg0 = slab[4:5, :]
    tg1 = slab[5:6, :]

    cr[0:1, :] = zrow
    cr[1:2, :] = zrow
    cr[2:3, :] = zrow

    def body_a(i, _):
        j = ns - 1 - i
        rs = pl.ds(j * sb, sb)
        xb = xbm_ref[:, rs].T  # (sb, wb) length-major
        tb = jnp.broadcast_to(t_ref[rs, :], (sb, wb))
        raw_obs = ~(xb != xb)
        if version == 0:
            imp_lead = tb == tg0
            imp_trail = tb == tg1
        else:
            imp_lead = tb < first_t
            imp_trail = (tb > last_t) & (tb <= tg1)
        xv = jnp.where(raw_obs, xb,
                       jnp.where(imp_lead, jnp.broadcast_to(v_first, (sb, wb)),
                                 jnp.broadcast_to(v_last, (sb, wb))))
        ob = raw_obs | imp_lead | imp_trail
        xsb = jnp.where(ob, xv, jnp.zeros_like(xv))
        obf = ob.astype(dt)
        xs[rs, :] = xsb
        obs[rs, :] = obf

        cxv, ctv, cfv = cr[0:1, :], cr[1:2, :], cr[2:3, :]
        hr_o, pds_o, sph_o = [], [], []
        for q in reversed(range(nsub)):
            xj = xsb[q * sub:(q + 1) * sub, :]
            tj = tb[q * sub:(q + 1) * sub, :]
            oj = obf[q * sub:(q + 1) * sub, :]
            (xin, tin), flin = _fill_block([xj, tj], oj, reverse=True)
            xin = jnp.where(flin > 0.5, xin, cxv)
            tin = jnp.where(flin > 0.5, tin, ctv)
            ftot = jnp.maximum(flin, cfv)
            xn = _shift_after(xin, cxv, sub, wb)
            tn = _shift_after(tin, ctv, sub, wb)
            f_after = _shift_after(ftot, cfv, sub, wb)
            has_next = (oj > 0.5) & (f_after > 0.5)
            h = tn - tj
            hrq = jnp.where(has_next,
                            1.0 / jnp.where(has_next, h, jnp.ones_like(h)), 0.0)
            sphq = 6.0 * (xn - xj) * hrq
            pdsq = 0.5 * sphq * hrq
            hr_o.append(hrq)
            pds_o.append(pdsq)
            sph_o.append(sphq)
            cxv = xin[:1, :]
            ctv = tin[:1, :]
            cfv = ftot[:1, :]
        hr[rs, :] = jnp.concatenate(hr_o[::-1], axis=0)
        pds[rs, :] = jnp.concatenate(pds_o[::-1], axis=0)
        sph[rs, :] = jnp.concatenate(sph_o[::-1], axis=0)
        cr[0:1, :] = cxv
        cr[1:2, :] = ctv
        cr[2:3, :] = cfv
        return 0

    jax.lax.fori_loop(0, ns, body_a, 0)

    # ---- Phase B (forward): previous-observed fill + assembly + Thomas
    # forward sweep via Mobius/affine prefixes (_assemble_fwd_kernel).
    cr[0:1, :] = zrow   # ch
    cr[1:2, :] = zrow   # cpd
    cr[2:3, :] = zrow   # cf
    cr[3:4, :] = onerow  # cp
    cr[4:5, :] = onerow  # cq
    cr[5:6, :] = zrow   # cb
    rows = _rows(sub, wb)

    def body_b(i, _):
        rs = pl.ds(i * sb, sb)
        hrb = hr[rs, :]
        pdb = pds[rs, :]
        obf = obs[rs, :]
        ch, cpd, cf = cr[0:1, :], cr[1:2, :], cr[2:3, :]
        cp, cq, cb = cr[3:4, :], cr[4:5, :], cr[5:6, :]
        nd_o, nb_o = [], []
        for q in range(nsub):
            hrq = hrb[q * sub:(q + 1) * sub, :]
            pdsq = pdb[q * sub:(q + 1) * sub, :]
            obsfq = obf[q * sub:(q + 1) * sub, :]
            obsq = obsfq > 0.5

            (hrin, pdin), flin = _fill_block([hrq, pdsq], obsfq, reverse=False)
            hrin = jnp.where(flin > 0.5, hrin, ch)
            pdin = jnp.where(flin > 0.5, pdin, cpd)
            ftot = jnp.maximum(flin, cf)

            hp = _shift_before(hrin, ch, sub, wb)
            pds_prev = _shift_before(pdin, cpd, sub, wb)

            d = 2.0 * (hp + hrq)
            d = jnp.where(obsq & (d > 0), d, jnp.ones_like(d))
            r = pds_prev + pdsq

            c = hp * hp
            m00 = jnp.where(obsq, d, 1.0)
            m01 = jnp.where(obsq, -c, 0.0)
            m10 = jnp.where(obsq, jnp.ones_like(d), 0.0)
            m11 = jnp.where(obsq, jnp.zeros_like(d), 1.0)

            s = 1
            while s < sub:
                keep = rows >= s
                b00 = jnp.where(keep, pltpu.roll(m00, s, axis=0), 1.0)
                b01 = jnp.where(keep, pltpu.roll(m01, s, axis=0), 0.0)
                b10 = jnp.where(keep, pltpu.roll(m10, s, axis=0), 0.0)
                b11 = jnp.where(keep, pltpu.roll(m11, s, axis=0), 1.0)
                m00, m01, m10, m11 = _matmul2(m00, m01, m10, m11,
                                              b00, b01, b10, b11)
                m00, m01, m10, m11 = _rescale2(m00, m01, m10, m11)
                s *= 2

            p = m00 * cp + m01 * cq
            q_ = m10 * cp + m11 * cq
            scale = 1.0 / jnp.maximum(
                jnp.maximum(jnp.abs(p), jnp.abs(q_)), 1e-30)
            p = p * scale
            q_ = q_ * scale
            ndq = p / jnp.where(q_ == 0, 1e-30, q_)

            first = rows < 1
            p_prev = jnp.where(first, cp, pltpu.roll(p, 1, axis=0))
            q_prev = jnp.where(first, cq, pltpu.roll(q_, 1, axis=0))
            nd_prev = p_prev / jnp.where(q_prev == 0, 1e-30, q_prev)

            A = jnp.where(obsq, r, 0.0)
            B = jnp.where(obsq,
                          -hp / jnp.where(nd_prev == 0, 1e-30, nd_prev),
                          jnp.ones_like(d))
            s = 1
            while s < sub:
                keep = rows >= s
                A_sh = jnp.where(keep, pltpu.roll(A, s, axis=0), 0.0)
                B_sh = jnp.where(keep, pltpu.roll(B, s, axis=0), 1.0)
                A, B = A + B * A_sh, B * B_sh
                s *= 2
            nbq = A + B * cb

            nd_o.append(jnp.where(obsq, ndq, 1.0))
            nb_o.append(jnp.where(obsq, nbq, 0.0))

            ch = hrin[sub - 1:, :]
            cpd = pdin[sub - 1:, :]
            cf = ftot[sub - 1:, :]
            cp = p[sub - 1:, :]
            cq = q_[sub - 1:, :]
            cb = nbq[sub - 1:, :]
        nd[rs, :] = jnp.concatenate(nd_o, axis=0)
        nb[rs, :] = jnp.concatenate(nb_o, axis=0)
        cr[0:1, :] = ch
        cr[1:2, :] = cpd
        cr[2:3, :] = cf
        cr[3:4, :] = cp
        cr[4:5, :] = cq
        cr[5:6, :] = cb
        return 0

    jax.lax.fori_loop(0, ns, body_b, 0)

    # ---- Phase C (reverse): back substitution + spline algebra
    # (_subst_kernel, restructured over sub-slices).  Writes b0/c0/d0 over
    # pds/nd/nb after their last read in this same iteration; a0 is xs.
    cr[0:1, :] = zrow  # cu

    def body_c(i, _):
        j = ns - 1 - i
        rs = pl.ds(j * sb, sb)
        ndb = nd[rs, :]
        nbb = nb[rs, :]
        hrb = hr[rs, :]
        sphb = sph[rs, :]
        obf = obs[rs, :]
        cu = cr[0:1, :]
        b_o, c_o, d_o = [], [], []
        for q in reversed(range(nsub)):
            ndq = ndb[q * sub:(q + 1) * sub, :]
            nbq = nbb[q * sub:(q + 1) * sub, :]
            hrq = hrb[q * sub:(q + 1) * sub, :]
            sphq = sphb[q * sub:(q + 1) * sub, :]
            obsq = obf[q * sub:(q + 1) * sub, :] > 0.5

            nd_safe = jnp.where(ndq == 0, 1e-30, ndq)
            A = jnp.where(obsq, nbq / nd_safe, 0.0)
            B = jnp.where(obsq, -hrq / nd_safe, jnp.ones_like(ndq))
            s = 1
            while s < sub:
                keep = rows < sub - s
                A_sh = jnp.where(keep, pltpu.roll(A, sub - s, axis=0), 0.0)
                B_sh = jnp.where(keep, pltpu.roll(B, sub - s, axis=0), 1.0)
                A, B = A + B * A_sh, B * B_sh
                s *= 2
            u = A + B * cu
            kd = jnp.where(obsq, u, 0.0)
            kdn = _shift_after(u, cu, sub, wb)
            b_o.append(kd)
            c_o.append((sphq - 4.0 * kd - 2.0 * kdn) * hrq)
            d_o.append((-sphq + 3.0 * (kd + kdn)) * hrq * hrq)
            cu = u[:1, :]
        pds[rs, :] = jnp.concatenate(b_o[::-1], axis=0)
        nd[rs, :] = jnp.concatenate(c_o[::-1], axis=0)
        nb[rs, :] = jnp.concatenate(d_o[::-1], axis=0)
        cr[0:1, :] = cu
        return 0

    jax.lax.fori_loop(0, ns, body_c, 0)

    # ---- Phase D (forward): last-observed polynomial fill + re-basing
    # (_rebase_kernel), with the in-VMEM transpose before the batch-major
    # store.  Unobserved prefixes keep the global first row's entries.
    cr[0:1, :] = xs[0:1, :]
    cr[1:2, :] = pds[0:1, :]
    cr[2:3, :] = nd[0:1, :]
    cr[3:4, :] = nb[0:1, :]
    cr[4:5, :] = jnp.broadcast_to(t_ref[0:1, :], (1, wb))
    cr[5:6, :] = zrow

    def body_d(i, _):
        rs = pl.ds(i * sb, sb)
        a0b = xs[rs, :]
        b0b = pds[rs, :]
        c0b = nd[rs, :]
        d0b = nb[rs, :]
        obf = obs[rs, :]
        tb = jnp.broadcast_to(t_ref[rs, :], (sb, wb))
        ca, cb_, cc = cr[0:1, :], cr[1:2, :], cr[2:3, :]
        cd, ct, cf = cr[3:4, :], cr[4:5, :], cr[5:6, :]
        ao_o, bo_o, co_o, do_o = [], [], [], []
        for q in range(nsub):
            aq = a0b[q * sub:(q + 1) * sub, :]
            bq = b0b[q * sub:(q + 1) * sub, :]
            cq_ = c0b[q * sub:(q + 1) * sub, :]
            dq = d0b[q * sub:(q + 1) * sub, :]
            tq = tb[q * sub:(q + 1) * sub, :]
            oq = obf[q * sub:(q + 1) * sub, :]

            (ain, bin_, cin, din, tin), flin = _fill_block(
                [aq, bq, cq_, dq, tq], oq, reverse=False)
            seen = flin > 0.5
            a_k = jnp.where(seen, ain, ca)
            b_k = jnp.where(seen, bin_, cb_)
            c_k = jnp.where(seen, cin, cc)
            d_k = jnp.where(seen, din, cd)
            t_obs = jnp.where(seen, tin, ct)
            ftot = jnp.maximum(flin, cf)

            offset = t_obs - tq
            ao_o.append(a_k + ((0.5 * c_k - d_k * offset / 3.0) * offset
                               - b_k) * offset)
            bo_o.append(b_k + (d_k * offset - c_k) * offset)
            co_o.append(c_k - 2.0 * d_k * offset)
            do_o.append(d_k)

            ca = a_k[sub - 1:, :]
            cb_ = b_k[sub - 1:, :]
            cc = c_k[sub - 1:, :]
            cd = d_k[sub - 1:, :]
            ct = t_obs[sub - 1:, :]
            cf = ftot[sub - 1:, :]
        a_ref[:, rs] = jnp.concatenate(ao_o, axis=0).T
        b_ref[:, rs] = jnp.concatenate(bo_o, axis=0).T
        c_ref[:, rs] = jnp.concatenate(co_o, axis=0).T
        d_ref[:, rs] = jnp.concatenate(do_o, axis=0).T
        cr[0:1, :] = ca
        cr[1:2, :] = cb_
        cr[2:3, :] = cc
        cr[3:4, :] = cd
        cr[4:5, :] = ct
        cr[5:6, :] = cf
        return 0

    jax.lax.fori_loop(0, ns, body_d, 0)


@partial(jax.jit, static_argnames=("version", "k_orig", "wb", "sb", "sub",
                                   "interpret"))
def _fit_resident(xbm, tcol, version, k_orig, wb, sb, sub, interpret=False):
    """Resident fit on padded batch-major (n, k) raw values; n % wb == 0,
    k % sb == 0, ``k_orig`` the pre-padding grid length (for the trailing
    imputation bound).  Returns (a, b, two_c, three_d), batch-major (n, k)."""
    n, k = xbm.shape
    dt = xbm.dtype
    bm = pl.BlockSpec((wb, k), lambda w: (w, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((k, 1), lambda w: (0, 0), memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((k, wb), dt)] * 7 + [pltpu.VMEM((8, wb), dt)] * 2
    kern = partial(_resident_kernel, k=k, k_orig=k_orig, wb=wb, sb=sb,
                   sub=sub, version=version)
    shape = jax.ShapeDtypeStruct((n, k), dt)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(
        kern,
        out_shape=(shape,) * 4,
        grid=(n // wb,),
        in_specs=[bm, tspec],
        out_specs=(bm,) * 4,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(xbm, tcol)


def masked_natural_cubic_resident(t, x, version, interpret=False, wb=None,
                                  sub=None):
    """Whole NaN-masked natural-cubic fit, one kernel launch, batch-major I/O.

    Same contract as ``masked_cubic_pallas.masked_natural_cubic_full`` (raw
    values in, (a, b, two_c, three_d) full-grid rows out, callers slice off
    the last row) with 5 HBM array passes instead of the streaming
    pipeline's 31.  Callers should gate on ``resident_tile`` — the whole
    time axis must fit VMEM per batch tile.
    """
    from .pallas_dispatch import upcast_kernel_operands

    (x,), restore = upcast_kernel_operands(x)
    shape = x.shape
    k = shape[-1]
    x2 = x.reshape(-1, k)
    n = x2.shape[0]
    t = jnp.asarray(t, x2.dtype)

    if wb is None:
        if interpret:
            wb = 8
        else:
            wb = resident_tile((k + _SB - 1) // _SB * _SB)
            if wb is None:
                raise ValueError(
                    "masked_natural_cubic_resident: the time axis (length "
                    f"{k}) does not fit VMEM even at the minimum 128-lane "
                    "batch tile; use the streaming "
                    "masked_cubic_pallas.masked_natural_cubic_full instead."
                )
    if sub is None:
        sub = _SB if interpret else 8

    kpad = (-k) % _SB
    npad = (-n) % wb
    if kpad or npad:
        # NaN-padded rows/columns stay unobserved pass-throughs in every
        # scan (version-1 trailing imputation stops at t_grid_last); their
        # outputs are sliced off below.
        x2 = jnp.pad(x2, ((0, npad), (0, kpad)), constant_values=np.nan)
    if kpad:
        extra = t[-1] + jnp.arange(1, kpad + 1, dtype=t.dtype)
        t = jnp.concatenate([t, extra])
    tcol = t.reshape(-1, 1)

    a, b, c, d = _fit_resident(x2, tcol, version, k, wb, _SB, sub,
                               interpret=interpret)
    out = []
    for arr in (a, b, c, d):
        arr = arr[:n, :k] if (kpad or npad) else arr
        out.append(restore(arr.reshape(shape)))
    return tuple(out)
