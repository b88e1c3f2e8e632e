"""Fused Pallas kernel for PER-SAMPLE adaptive dopri5 Neural CDE solves.

``options={'per_sample': True}`` gives every batch element its own error
norm, PI controller and acceptance sequence (torchode's design,
arxiv 2210.12375).  Round 3 implemented it as a vmap of the single-sample
XLA adaptive loop — correct, but every stage is a separate dispatched HLO,
the regime the fused kernels exist to escape (round-3 VERDICT missing #5).

This kernel runs the per-lane controlled integration inside ONE Pallas
program.  It is the fused dopri5 kernel (fused_dopri_pallas.py) with the
controller scalars turned into LANE VECTORS:

* ``t``, ``dt``, attempted/accepted counters are (1, tile) rows — each lane
  advances at its own pace; finished lanes idle in lockstep SIMD (exactly
  the vmapped path's cost model: wall-clock is the slowest lane, total work
  is the sum of per-lane NFEs).
* the per-lane error norm reduces over the state rows only;
* the spline lookup becomes a per-lane interval gather.  Mosaic has no
  dynamic sublane gather (``take_along_axis`` fails to lower), so the
  kernel evaluates the interval polynomial for EVERY interval and one-hot
  reduces: ``dx = sum_j (j == j_lane) * poly_j(t_lane)`` — a single
  (n, C, tile) vectorised reduction per stage evaluation (~n*C*tile VPU
  ops), not a serial loop;
* every loop iteration appends (entry state, t, dt, accept mask) to HBM
  stores; the backward kernel replays the iterations in reverse, masking
  each lane's cotangent flow by its stored accept bit, and accumulates the
  per-lane coefficient cotangents with the transposed one-hot reduction
  into an (n, 16, tile) carry.

Per-lane budget exhaustion is LOUD per lane: lanes that hit ``max_steps``
NaN-poison their own outputs without disturbing converged lanes.

Gradients are frozen-mesh discretise-then-optimise, identical in kind to
direct backprop through the vmapped XLA loop (DESIGN.md "Direct-mode
gradients freeze the step sequence"); two f32 controller implementations
realise slightly different meshes, so cross-path agreement is bounded by
solution accuracy, not ulps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_pallas import (
    _LANES,
    _SLAB,
    _round_up,
    _selection_matrices,
    _stage_backward,
)
from .fused_dopri_pallas import (
    _ALPHA,
    _BETA,
    _BMID,
    _CERR,
    _CSOL,
    _NSTAGES,
    _ORDER,
    _VMEM_LIMIT,
    _dense_coeffs,
)

MAX_PS_TILE = 512    # lanes per kernel call (each lane is independent)
MAX_PS_INTERVALS = 128  # whole coefficient table must fit one kernel
_PS_STORE_CAP = 2048  # per-iteration trajectory rows (HBM)
_AUX_ROWS = 8        # aux store rows per iteration: [t; dt; accept; pad]


def _mlp_eval(dx, y, w1t, b1, w2t, b2, rep, sel, C, H):
    from .fused_pallas import _dot, _rep_rows, _sel_sum

    h1 = jnp.maximum(_dot(w1t, y) + b1, 0.0)
    g = jnp.tanh(_dot(w2t, h1) + b2)
    if rep is None:
        k = _sel_sum(g * _rep_rows(dx, C, H), C, H)
    else:
        k = _dot(sel, g * _dot(rep, dx))
    return k, h1, g


def _lane_dx(ct3, iota_n, tval, t0g, w, n, C):
    """Per-lane spline derivative rows at per-lane times ``tval`` (1, tile).

    One-hot over intervals: evaluates the derivative polynomial of every
    interval at each lane's local offset and reduces with the lane's
    interval mask — vectorised, no serial gather.  Returns (dx (C, tile),
    j_lane (1, tile), fr (1, tile))."""
    jl = jnp.clip(jnp.floor((tval - t0g) / w).astype(jnp.int32), 0, n - 1)
    fr = tval - (t0g + jl.astype(tval.dtype) * w)
    frn = tval[None] - (t0g + iota_n.astype(tval.dtype) * w)  # (n, 1, tile)
    b3 = ct3[:, 0:C]
    c3 = ct3[:, C : 2 * C]
    d3 = ct3[:, 2 * C : 3 * C]
    dxn = b3 + (c3 + d3 * frn) * frn                          # (n, C, tile)
    dx = jnp.sum(jnp.where(iota_n == jl[None], dxn, 0.0), axis=0)
    return dx, jl, fr


def _psd_fwd_kernel(ct_ref, z0_ref, w1_ref, b1_ref, w2_ref, b2_ref, dt0_ref,
                    zout_ref, zfin_ref, nacc_ref, natt_ref, zst_ref, aux_ref,
                    cnt_ref, z_scr, k1_scr, aux_scr, ctl_scr, dma_sem, aux_sem,
                    *, out_ts, t_start, t_end, t0g, w, n, rtol, atol,
                    max_steps, cap, C, H, B, safety, ifactor, dfactor):
    Hp = z0_ref.shape[0]
    tile = z0_ref.shape[1]
    CHp = w2_ref.shape[0]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    n_out = len(out_ts)

    ct3 = ct_ref[:, :].reshape(n, _SLAB, tile)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, tile), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, tile), 0)
    rowmask = (sub < H).astype(jnp.float32)

    def f_eval(y, tval):
        dx, _jl, _fr = _lane_dx(ct3, iota_n, tval, t0g, w, n, C)
        k, _h1, _g = _mlp_eval(dx, y, w1t, b1, w2t, b2, rep, sel, C, H)
        return k

    t0v = jnp.full((1, tile), jnp.float32(t_start))
    t1 = jnp.float32(t_end)
    z0 = z0_ref[:, :]
    z_scr[:, :] = z0
    k1_scr[:, :] = f_eval(z0, t0v)
    for k in range(max(n_out, 1)):
        zout_ref[pl.ds(k * Hp, Hp), :] = z0

    # Controller lane-rows live in a VMEM scratch block, NOT the while
    # carry: (1, tile) vectors in the carry trip a Mosaic relayout bug at
    # the loop back-edge ("Non-singleton logical dimension is replicated in
    # destination but not in source").  The carry holds only scalars
    # (iteration count + a do-while continue flag).
    ctl_scr[0:1, :] = t0v                      # t per lane
    ctl_scr[1:2, :] = dt0_ref[:, :]            # dt proposal per lane
    ctl_scr[2:3, :] = jnp.zeros((1, tile), jnp.float32)  # attempted
    ctl_scr[3:4, :] = jnp.zeros((1, tile), jnp.float32)  # accepted
    ctl_scr[4:_AUX_ROWS, :] = jnp.zeros((_AUX_ROWS - 4, tile), jnp.float32)

    def cond(carry):
        i, go = carry
        return (i < cap) & go

    def body(carry):
        i, _go = carry
        ctl = ctl_scr[:, :]
        t_l = ctl[0:1, :]
        dt_l = ctl[1:2, :]
        att = ctl[2:3, :]
        acc = ctl[3:4, :]
        active = (t_l < t1) & (att < max_steps)
        z = z_scr[:, :]
        k1 = k1_scr[:, :]
        dt = jnp.maximum(dt_l, 1e-14)
        dt_c = jnp.minimum(dt, t1 - t_l)                       # (1, tile)

        # Mesh stores FIRST (entry state + controller rows), so the
        # backward can replay iteration i from them.
        dma = pltpu.make_async_copy(
            z_scr, zst_ref.at[pl.ds(i * Hp, Hp), :], dma_sem)
        dma.start()

        ks = [k1]
        for alpha_i, beta_i in zip(_ALPHA, _BETA):
            y = z
            for q, coef in enumerate(beta_i):
                if coef != 0.0:
                    y = y + (dt_c * coef) * ks[q]
            ks.append(f_eval(y, t_l + alpha_i * dt_c))
        z1 = z
        for q, coef in enumerate(_CSOL):
            if coef != 0.0:
                z1 = z1 + (dt_c * coef) * ks[q]
        err = jnp.zeros_like(z)
        for q, coef in enumerate(_CERR):
            if coef != 0.0:
                err = err + coef * ks[q]
        err = dt_c * err

        scaled = err / (atol + rtol * jnp.maximum(jnp.abs(z), jnp.abs(z1)))
        scaled = scaled * rowmask
        ratio = jnp.sqrt(
            jnp.sum(scaled * scaled, axis=0, keepdims=True) / float(H))
        accept = (ratio <= 1.0) & active
        acceptf = accept.astype(jnp.float32)

        ratio_s = jnp.maximum(ratio, 1e-10)
        factor = safety * jnp.exp((-1.0 / _ORDER) * jnp.log(ratio_s))
        factor = jnp.where(jnp.isfinite(factor), factor, dfactor)
        upper = jnp.where(accept, ifactor, 1.0)
        dt_new = dt_c * jnp.clip(factor, dfactor, upper)
        was_clamped = dt_c < dt
        dt_new = jnp.where(accept & was_clamped,
                           jnp.maximum(dt, dt_new), dt_new)
        dt_next = jnp.where(active, dt_new, dt_l)

        dma.wait()
        aux_scr[0:1, :] = t_l
        aux_scr[1:2, :] = dt_c
        aux_scr[2:3, :] = acceptf
        aux_scr[3:_AUX_ROWS, :] = jnp.zeros((_AUX_ROWS - 3, tile), jnp.float32)
        adma = pltpu.make_async_copy(
            aux_scr, aux_ref.at[pl.ds(i * _AUX_ROWS, _AUX_ROWS), :], aux_sem)
        adma.start()

        # Dense output at the static shared times, per lane.
        y_mid = z
        for q, coef in enumerate(_BMID):
            if coef != 0.0:
                y_mid = y_mid + (dt_c * coef) * ks[q]
        for k in range(n_out):
            ts_k = jnp.float32(out_ts[k])
            hit = accept & (ts_k > t_l) & (ts_k <= t_l + dt_c)
            theta = jnp.clip((ts_k - t_l) / jnp.maximum(dt_c, 1e-30), 0.0, 1.0)
            cA, cB, cC = _dense_coeffs(theta)
            rA = z1 - z - dt_c * ks[0]
            rB = dt_c * (ks[-1] - ks[0])
            rC = y_mid - z - 0.5 * dt_c * ks[0]
            val = z + theta * dt_c * ks[0] + cA * rA + cB * rB + cC * rC
            cur = zout_ref[pl.ds(k * Hp, Hp), :]
            zout_ref[pl.ds(k * Hp, Hp), :] = jnp.where(hit, val, cur)

        adma.wait()
        z_scr[:, :] = jnp.where(accept, z1, z)
        k1_scr[:, :] = jnp.where(accept, ks[-1], k1)
        t_new = jnp.where(accept, t_l + dt_c, t_l)
        att_new = att + jnp.where(active, 1.0, 0.0)
        acc_new = acc + acceptf
        ctl_scr[0:1, :] = t_new
        ctl_scr[1:2, :] = dt_next
        ctl_scr[2:3, :] = att_new
        ctl_scr[3:4, :] = acc_new
        still = (t_new < t1) & (att_new < max_steps)
        return (i + 1, jnp.any(still))

    go0 = jnp.any((t0v < t1))
    i_fin, _go = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), go0))
    cnt_ref[0, 0] = i_fin
    nacc_ref[:, :] = ctl_scr[3:4, :]
    natt_ref[:, :] = ctl_scr[2:3, :]

    # LOUD per-lane exhaustion: poison only the lanes whose budget ran out.
    bad = ctl_scr[0:1, :] < t1
    nanv = jnp.float32(jnp.nan)
    zfin_ref[:, :] = jnp.where(bad, nanv, z_scr[:, :])
    for k in range(max(n_out, 1)):
        cur = zout_ref[pl.ds(k * Hp, Hp), :]
        zout_ref[pl.ds(k * Hp, Hp), :] = jnp.where(bad, nanv, cur)


def _psd_bwd_kernel(ct_ref, zst_ref, aux_ref, cnt_ref, gz_ref, gzfin_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    dct_ref, dz0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    lam_scr, emit_scr, zvm_scr, aux_vm, dma_sem, aux_sem,
                    *, out_ts, t0g, w, n, C, H):
    Hp = dz0_ref.shape[0]
    tile = dz0_ref.shape[1]
    CHp = w2_ref.shape[0]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    n_out = len(out_ts)

    ct3 = ct_ref[:, :].reshape(n, _SLAB, tile)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, tile), 0)

    dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
    db1_ref[:, :] = jnp.zeros_like(db1_ref)
    dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
    db2_ref[:, :] = jnp.zeros_like(db2_ref)
    lam_scr[:, :] = gzfin_ref[:, :]
    emit_scr[:, :] = jnp.zeros_like(emit_scr)
    cnt = cnt_ref[0, 0]

    def stage_eval(y, tval):
        dx, jl, fr = _lane_dx(ct3, iota_n, tval, t0g, w, n, C)
        k, h1, g = _mlp_eval(dx, y, w1t, b1, w2t, b2, rep, sel, C, H)
        return k, (y, fr, jl, h1, g, dx)

    def body(i, dct3):
        s = cnt - 1 - i
        dma = pltpu.make_async_copy(
            zst_ref.at[pl.ds(s * Hp, Hp), :], zvm_scr, dma_sem)
        dma.start()
        adma = pltpu.make_async_copy(
            aux_ref.at[pl.ds(s * _AUX_ROWS, _AUX_ROWS), :], aux_vm, aux_sem)
        adma.start()
        dma.wait()
        adma.wait()
        z = zvm_scr[:, :]
        t_l = aux_vm[0:1, :]
        dt = aux_vm[1:2, :]
        acceptf = aux_vm[2:3, :]
        accept = acceptf > 0.5

        ks, saved = [], []
        for stg in range(_NSTAGES):
            y = z
            if stg:
                for q, coef in enumerate(_BETA[stg - 1]):
                    if coef != 0.0:
                        y = y + (dt * coef) * ks[q]
            tval = t_l if stg == 0 else t_l + _ALPHA[stg - 1] * dt
            k, sv = stage_eval(y, tval)
            ks.append(k)
            saved.append(sv)
        z1 = z
        for q, coef in enumerate(_CSOL):
            if coef != 0.0:
                z1 = z1 + (dt * coef) * ks[q]
        y_mid = z
        for q, coef in enumerate(_BMID):
            if coef != 0.0:
                y_mid = y_mid + (dt * coef) * ks[q]

        lam = lam_scr[:, :]
        lam_z = jnp.zeros_like(lam)
        lam_z1 = lam
        seeds = [jnp.zeros_like(lam) for _ in range(_NSTAGES)]
        u_mid = jnp.zeros_like(lam)

        for k in range(n_out):
            ts_k = jnp.float32(out_ts[k])
            hit = accept & (ts_k > t_l) & (ts_k <= t_l + dt)
            hitf = hit.astype(jnp.float32)
            gk = gz_ref[pl.ds(k * Hp, Hp), :]
            theta = jnp.clip((ts_k - t_l) / jnp.maximum(dt, 1e-30), 0.0, 1.0)
            cA, cB, cC = _dense_coeffs(theta)
            gku = gk * hitf
            lam_z = lam_z + (1.0 - cA - cC) * gku
            lam_z1 = lam_z1 + cA * gku
            seeds[0] = seeds[0] + (dt * (theta - cA - cB - 0.5 * cC)) * gku
            seeds[-1] = seeds[-1] + (dt * cB) * gku
            u_mid = u_mid + cC * gku
            prev = emit_scr[pl.ds(k, 1), :]
            emit_scr[pl.ds(k, 1), :] = jnp.maximum(prev, hitf)

        lam_z = lam_z + u_mid + lam_z1
        for q in range(_NSTAGES):
            seeds[q] = seeds[q] + (dt * _BMID[q]) * u_mid \
                + (dt * _CSOL[q]) * lam_z1

        v = [None] * _NSTAGES
        for stg in reversed(range(_NSTAGES)):
            u = seeds[stg]
            for s2 in range(stg + 1, _NSTAGES):
                coef = _BETA[s2 - 1][stg]
                if coef != 0.0:
                    u = u + (dt * coef) * v[s2]
            # Mask the cotangent by the lane's accept bit: lanes whose step
            # was rejected (or idle) contribute nothing to any gradient and
            # keep their incoming lambda (selected below).
            u = u * acceptf
            y_s, fr, jl, h1, g, dx = saved[stg]
            dy, dw1t, db1_, dw2t, db2_, ddx = _stage_backward(
                u, y_s, fr, h1, g, dx, w1t, w2t, rep, sel, C, H)
            v[stg] = dy
            dw1_ref[:, :] += dw1t
            db1_ref[:, :] += db1_
            dw2_ref[:, :] += dw2t
            db2_ref[:, :] += db2_
            upd = jnp.concatenate(
                [ddx, fr * ddx, (fr * fr) * ddx,
                 jnp.zeros((_SLAB - 3 * C, ddx.shape[1]), ddx.dtype)], axis=0)
            dct3 = dct3 + jnp.where(iota_n == jl[None], upd[None], 0.0)
        for stg in range(_NSTAGES):
            lam_z = lam_z + v[stg]

        lam_scr[:, :] = jnp.where(accept, lam_z, lam)
        return dct3

    dct3 = jax.lax.fori_loop(
        0, cnt, body, jnp.zeros((n, _SLAB, tile), jnp.float32))
    dct_ref[:, :] = dct3.reshape(n * _SLAB, tile)

    dz0 = lam_scr[:, :]
    for k in range(n_out):
        miss = 1.0 - emit_scr[pl.ds(k, 1), :]
        dz0 = dz0 + miss * gz_ref[pl.ds(k * Hp, Hp), :]
    dz0_ref[:, :] = dz0


@functools.lru_cache(maxsize=64)
def _make_fused_dopri_ps(n, tile, out_ts, t_start, t_end, t0g, w, rtol, atol,
                         max_steps, cap, C, H, W, CHp, B, safety, ifactor,
                         dfactor, interpret):
    """Per-sample solve over the whole table.  Returns (zout, zfin)."""
    Hp = _round_up(H, 8)
    n_out = len(out_ts)
    n_out_rows = max(n_out, 1)
    n_out_pad = _round_up(n_out_rows, _LANES)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)}

    fwd_call = pl.pallas_call(
        functools.partial(
            _psd_fwd_kernel, out_ts=out_ts, t_start=t_start, t_end=t_end,
            t0g=t0g, w=w, n=n, rtol=rtol, atol=atol, max_steps=max_steps,
            cap=cap, C=C, H=H, B=B, safety=safety, ifactor=ifactor,
            dfactor=dfactor),
        out_shape=(
            jax.ShapeDtypeStruct((n_out_rows * Hp, tile), jnp.float32),  # zout
            jax.ShapeDtypeStruct((Hp, tile), jnp.float32),   # z final
            jax.ShapeDtypeStruct((1, tile), jnp.float32),    # accepted/lane
            jax.ShapeDtypeStruct((1, tile), jnp.float32),    # attempted/lane
            jax.ShapeDtypeStruct((cap * Hp, tile), jnp.float32),       # z store
            jax.ShapeDtypeStruct((cap * _AUX_ROWS, tile), jnp.float32),  # aux
            jax.ShapeDtypeStruct((1, 1), jnp.int32),         # iterations
        ),
        in_specs=[vspec] * 7,
        out_specs=(vspec, vspec, vspec, vspec, hbm, hbm, smem_scalar),
        scratch_shapes=[pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((_AUX_ROWS, tile), jnp.float32),
                        pltpu.VMEM((_AUX_ROWS, tile), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        **params,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_psd_bwd_kernel, out_ts=out_ts, t0g=t0g, w=w, n=n,
                          C=C, H=H),
        out_shape=(
            jax.ShapeDtypeStruct((n * _SLAB, tile), jnp.float32),  # dct
            jax.ShapeDtypeStruct((Hp, tile), jnp.float32),         # dz0
            jax.ShapeDtypeStruct((W, Hp), jnp.float32),
            jax.ShapeDtypeStruct((W, 1), jnp.float32),
            jax.ShapeDtypeStruct((CHp, W), jnp.float32),
            jax.ShapeDtypeStruct((CHp, 1), jnp.float32),
        ),
        in_specs=[vspec, hbm, hbm, smem_scalar] + [vspec] * 6,
        out_specs=(vspec,) * 6,
        scratch_shapes=[pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((n_out_rows, tile), jnp.float32),
                        pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((_AUX_ROWS, tile), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        **params,
    )

    @jax.custom_vjp
    def solve(ct2, z0t, w1t, b1, w2t, b2, dt0):
        zout, zfin, _na, _nt, _zs, _ax, _c = fwd_call(
            ct2, z0t, w1t, b1, w2t, b2, dt0)
        return zout, zfin

    def solve_fwd(ct2, z0t, w1t, b1, w2t, b2, dt0):
        zout, zfin, _na, _nt, zs, ax, c = fwd_call(
            ct2, z0t, w1t, b1, w2t, b2, dt0)
        return (zout, zfin), (ct2, z0t, w1t, b1, w2t, b2, zs, ax, c)

    def solve_bwd(res, cotangents):
        gz, gzfin = cotangents
        ct2, z0t, w1t, b1, w2t, b2, zs, ax, c = res
        dct, dz0, dw1, db1, dw2, db2 = bwd_call(
            ct2, zs, ax, c, gz, gzfin, w1t, b1, w2t, b2)
        zero_dt = jnp.zeros((1, z0t.shape[1]), jnp.float32)
        return dct, dz0, dw1, db1, dw2, db2, zero_dt

    solve.defvjp(solve_fwd, solve_bwd)
    solve._fwd_call = fwd_call  # for tests: per-lane counters
    return solve


def _per_lane_initial_step(rhs, t0, z0b, order, rtol, atol):
    """Hairer/Wanner initial-step heuristic with PER-LANE norms (the lane-
    vector analogue of integrate.select_initial_step)."""
    def rms(x):
        return jnp.sqrt(jnp.mean(jnp.square(x), axis=-1))

    f0 = rhs(t0, z0b)
    scale = atol + jnp.abs(z0b) * rtol
    d0 = rms(z0b / scale)
    d1 = rms(f0 / scale)
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-30))
    z1 = z0b + h0[..., None] * f0
    f1 = rhs(t0 + jnp.min(h0), z1)  # shared probe time: min over lanes
    d2 = rms((f1 - f0) / scale) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100 * h0, h1)


def try_fused_dopri5_per_sample(X, func, z0, ts, *, rtol, atol, max_steps):
    """Attempt the fused per-sample dopri5 solve.

    Same eligibility as try_fused_dopri5 (CubicSpline over a concrete
    uniform grid, MLPVectorField, f32/bf16, single device, concrete shared
    1-D output times) plus: the whole coefficient table must fit one kernel
    (no chunk streaming yet).  Returns the time-leading (len(ts), ..., H)
    solution or None.
    """
    from ..interpolation.cubic import CubicSpline
    from ..utils.misc import is_concrete
    from . import fused_pallas
    from .terms import MLPVectorField, make_cde_rhs

    interpret = fused_pallas._kernel_mode()
    if interpret is None:
        return None
    if not isinstance(func, MLPVectorField) or isinstance(z0, (tuple, list)):
        return None
    if not isinstance(X, CubicSpline):
        return None
    grid = X.grid_points
    if not isinstance(grid, np.ndarray) or grid.shape[0] < 2:
        return None
    if isinstance(ts, np.ndarray):
        ts_np = ts.astype(np.float64)
    elif is_concrete(ts) and jnp.ndim(ts) == 1:
        ts_np = np.asarray(ts, dtype=np.float64)
    else:
        return None
    spans = np.diff(grid.astype(np.float64))
    if not np.allclose(spans, spans[0], rtol=1e-9, atol=1e-12):
        return None
    w = float(spans[0])
    n = grid.shape[0] - 1
    if n > MAX_PS_INTERVALS or len(ts_np) > 64:
        return None
    if float(ts_np[0]) < float(grid[0]) - 1e-9 or \
            float(ts_np[-1]) > float(grid[-1]) + 1e-9:
        return None
    if max_steps is not None and max_steps > _PS_STORE_CAP:
        return None
    cap = min(max_steps or _PS_STORE_CAP, _PS_STORE_CAP)

    p_full = fused_pallas._pack_operands(X._b, X._two_c, X._three_d, z0, func,
                                         n)
    if p_full is None:
        return None

    cfgd = dict(rtol=float(rtol), atol=float(atol))

    # Per-lane initial step (3 dispatched evals, negligible).
    rhs = make_cde_rhs(func, X)
    t0 = jnp.asarray(ts_np[0], jnp.float32)
    z0b = jnp.broadcast_to(z0, p_full.batch + z0.shape[-1:])
    dt0 = _per_lane_initial_step(rhs, t0, z0b, _ORDER, cfgd["rtol"],
                                 cfgd["atol"])
    dt0 = jax.lax.stop_gradient(dt0).astype(jnp.float32).reshape(1, -1)

    B = p_full.B
    batch_shape = p_full.batch
    H, C = p_full.H, p_full.C
    rows_flat = tuple(
        jnp.broadcast_to(r, batch_shape + r.shape[-2:]).reshape(B, n, C)
        for r in (X._b, X._two_c, X._three_d)
    )
    z0_flat = jnp.broadcast_to(z0, batch_shape + (H,)).reshape(B, H)

    out_ts = tuple(float(v) for v in ts_np)
    group_outs = []
    for g0 in range(0, B, MAX_PS_TILE):
        g1 = min(g0 + MAX_PS_TILE, B)
        p = fused_pallas._pack_operands(
            rows_flat[0][g0:g1], rows_flat[1][g0:g1], rows_flat[2][g0:g1],
            z0_flat[g0:g1], func, n, single_tile=MAX_PS_TILE)
        if p is None:
            return None
        dt0_g = jnp.pad(dt0[:, g0:g1], ((0, 0), (0, p.Bp - (g1 - g0))),
                        constant_values=1.0)
        solve = _make_fused_dopri_ps(
            n, p.Bp, out_ts, float(ts_np[0]), float(ts_np[-1]),
            float(grid[0]), w, cfgd["rtol"], cfgd["atol"], int(cap), int(cap),
            C, H, p.W, p.CHp, p.B, 0.9, 10.0, 0.2, interpret)
        zout, _zfin = solve(p.ct2, p.z0t, p.w1t, p.b1c, p.w2t, p.b2c, dt0_g)
        z3 = zout.reshape(len(out_ts), p.Hp, p.Bp)[:, :H, :p.B]
        group_outs.append(z3)

    out = jnp.concatenate(group_outs, axis=-1)  # (n_out, H, B)
    out = jnp.moveaxis(out, 1, -1).reshape(
        (len(out_ts),) + batch_shape + (H,))
    return out.astype(p_full.out_dtype)
