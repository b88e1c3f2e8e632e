"""Fused Pallas TPU kernel for ADAPTIVE (dopri5) Neural CDE solves.

The reference-default configuration — ``cdeint(..., method="dopri5")``,
tolerance-controlled (solver.py:195-198) — runs hundreds of sequential tiny
HLOs per solve: six MLP stage evaluations, error norms, and controller
scalars per attempted step, each paying the ~4.6us fixed dispatch cost that
already motivated the fixed-step kernel (fused_pallas.py).  This kernel runs
the whole adaptive integration inside one Pallas program:

* the coefficient table sits in VMEM (uniform knot spacing, so the
  interval of any stage time is ``floor((t - t0)/w)`` — no searchsorted);
* a ``lax.while_loop`` carries (t, dt, step counters) as scalars with the
  state and FSAL stage in VMEM scratch, replicating integrate.py's PI
  controller (error ratio, accept/reject, clamp-to-end, growth-after-reject
  rules) bit-for-bit in kernel arithmetic;
* each accepted step evaluates the same 4th-order dense-output quartic as
  integrate.py at every (static, concrete) output time inside the step;
* accepted steps append (t, dt, z) to a trajectory store, giving the
  backward kernel the realised mesh.

The backward kernel walks the stored mesh in reverse, recomputing the seven
dopri5 stages per step and hand-propagating cotangents (including the
dense-output interpolant's, which is linear in (z, z1, f0, f1, y_mid)) — the
same frozen-mesh, discretise-then-optimise gradients as direct backprop
through the XLA path (DESIGN.md "Direct-mode gradients freeze the step
sequence"), with O(accepted_steps * H) residual memory.  It therefore serves
both ``adjoint=False`` and eligible ``adjoint=True`` solves, like the
fixed-step kernel.

North-star scale (lifting round 2's caps) is handled by COMPOSING kernel
calls at the XLA level rather than growing the kernel:

* Batches beyond one tile (MAX_TILE lanes, VMEM permitting) split into
  independent per-group solves — batch elements of a CDE are independent
  ODEs, so each group gets its own PI controller.  SEMANTIC NOTE: torchdiffeq
  (and the XLA path) control the step size with ONE error norm over the whole
  batch; the grouped kernel controls each tile-lane group separately.  Both
  are standard dopri5 solves to the same tolerances — gradients and dense
  output are exact for the realised mesh either way — but step sequences
  differ from the whole-batch norm's (each group's solution is exactly the
  kernel's single-tile answer for that sub-batch).  At MAX_TILE = 4096 the
  reference-default north-star batch runs as ONE group, i.e. genuinely the
  whole-batch norm.
* Long coefficient tables stream as chunks: the solve runs chunk-by-chunk
  over [grid[j0], grid[j1]] windows with (state, dt proposal) carried between
  chunks and the FSAL stage re-evaluated at each chunk entry.  Steps clamp to
  chunk boundaries (the was_clamped rule preserves the dt proposal across
  them), adding at most one extra step boundary per chunk versus the
  unchunked mesh.  Output times are routed to the chunk whose span contains
  them; gradients compose across chunks through plain autodiff over the
  per-chunk custom_vjps.  The chunk length adapts to what VMEM admits at the
  chosen tile width — a wide tile with short chunks beats narrow tiles with
  long chunks, because chunking splits the time axis (total steps stay ~one
  solve's worth) while grouping splits the batch (total steps multiply).
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
    _stage_forward,
)
from .runge_kutta import DOPRI5, _solve_dense_midpoint

MAX_TILE = 4096    # lanes per kernel call; one error norm couples one tile
MAX_INTERVALS = 128  # coefficient-table chunk held in VMEM per call (upper bound)
MAX_OUT_TIMES = 64   # dense-output rows per chunk
_STORE_CAP = 2048  # accepted-step trajectory rows (HBM, DMA-written)
# Mosaic's DEFAULT scoped-VMEM limit is 16 MB, but v5e physically carries
# far more (a 64 MB scratch kernel compiles and runs with an explicit
# vmem_limit_bytes) — the dopri kernels request _VMEM_LIMIT and the budget
# model plans against _VMEM_BUDGET (headroom for Mosaic's own temporaries).
_VMEM_LIMIT = 120 * 1024 * 1024
_VMEM_BUDGET = 100 * 1024 * 1024

# Tile-vs-chunk tradeoff: a WIDE batch tile with SHORT coefficient chunks
# beats narrow tiles with long chunks, because chunking splits the TIME axis
# (total step count stays ~one solve's worth, +1 clamped step per boundary)
# while grouping splits the BATCH (total step count multiplies by the group
# count).  Round 3 ran batch 4096 as 8 sequential 512-lane solves — 8x the
# serial stepping; now the tile takes the whole batch (up to MAX_TILE) and
# the chunk length shrinks to whatever VMEM admits at that width.

# Quartic dense-output inverse system (integrate.py _QUARTIC_MINV).  Python
# floats, NOT NumPy scalars: under jax_enable_x64 an np.float64 scalar would
# promote the kernel's f32 state to f64 and break the f32 ref stores.
_MINV = [
    [float(v) for v in row]
    for row in np.linalg.inv(
        np.array([[1.0, 1.0, 1.0], [4.0, 3.0, 2.0], [1 / 16, 1 / 8, 1 / 4]])
    )
]
_BMID = _solve_dense_midpoint(DOPRI5)

_ALPHA = DOPRI5.alpha
_BETA = DOPRI5.beta
_CSOL = DOPRI5.c_sol
_CERR = DOPRI5.c_error
_ORDER = DOPRI5.order
_NSTAGES = len(_CSOL)  # 7 (FSAL: stage 7 = f(t+dt, z1))


def _slab_at(ct_ref, tval, t0g, w, n, left=False, lead=False):
    """Coefficient slab and frac for a (traced scalar) time on the uniform
    grid: interval floor((t - t0g)/w) clamped to [0, n-1].

    ``left=True`` selects the LEFT-continuous interval at knots —
    ceil((t - t0g)/w) - 1 — reproducing the reference's bucketize
    convention for piecewise-linear controls
    (interpolation_linear.py:203-210, searchsorted side='left' minus one):
    a stage landing exactly on an interior knot reads the *previous*
    interval's slope.  Cubic derivatives are knot-continuous, so the
    (cheaper) floor rule is used there.

    ``lead=True`` (linear chunk streaming): the resident table carries ONE
    extra interval to the LEFT of the chunk's start knot t0g (slab 0 is the
    PREVIOUS chunk's last interval), so a stage landing exactly on the
    chunk-boundary knot (pos == 0, which every clamped step produces) still
    reads the left slope instead of clipping to the right one — without it,
    chunked and unchunked solves of the same linear control diverge at
    every boundary."""
    pos = (tval - t0g) / w
    if left:
        j = jnp.ceil(pos).astype(jnp.int32) - (0 if lead else 1)
    else:
        j = jnp.floor(pos).astype(jnp.int32)
    j = jnp.clip(j, 0, n - 1)
    slab = ct_ref[pl.ds(j * _SLAB, _SLAB), :]
    fr = tval - (t0g + (j - (1 if lead else 0)).astype(tval.dtype) * w)
    return slab, fr, j


def _masked_error_ratio(err, z0, z1, rtol, atol, mask, count):
    scaled = err / (atol + rtol * jnp.maximum(jnp.abs(z0), jnp.abs(z1)))
    scaled = scaled * mask
    return jnp.sqrt(jnp.sum(scaled * scaled) / count)


def _dense_coeffs(theta):
    """Quartic interpolant weights (cA, cB, cC) at theta (traced scalar)."""
    m = _MINV
    p2 = theta * theta
    p3 = p2 * theta
    p4 = p3 * theta
    cA = p2 * m[2][0] + p3 * m[1][0] + p4 * m[0][0]
    cB = p2 * m[2][1] + p3 * m[1][1] + p4 * m[0][1]
    cC = p2 * m[2][2] + p3 * m[1][2] + p4 * m[0][2]
    return cA, cB, cC


def _dopri_fwd_kernel(ct_ref, z0_ref, w1_ref, b1_ref, w2_ref, b2_ref, dt0_ref,
                      zout_ref, zfin_ref, dtfin_ref, zst_ref, tst_ref,
                      dtst_ref, cnt_ref, z_scr, k1_scr, dma_sem,
                      *, out_ts, t_start, t_end, t0g, w, n, rtol, atol,
                      max_steps, cap, C, H, B, safety, ifactor, dfactor,
                      linear=False, lead=False):
    CHp = w2_ref.shape[0]
    Hp = z0_ref.shape[0]
    tile = z0_ref.shape[1]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    n_out = len(out_ts)

    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, tile), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, tile), 0)
    mask = ((lane < B) & (sub < H)).astype(jnp.float32)
    norm_count = float(B * H)

    def f_eval(y, tval):
        slab, fr, _j = _slab_at(ct_ref, tval, t0g, w, n, left=linear,
                                lead=lead)
        k, _h1, _g, _dx = _stage_forward(y, fr, slab, w1t, b1, w2t, b2,
                                         rep, sel, C, H, linear=linear)
        return k

    z0 = z0_ref[:, :]
    z_scr[:, :] = z0
    t0 = jnp.float32(t_start)
    t1 = jnp.float32(t_end)
    k1_scr[:, :] = f_eval(z0, t0)
    for k in range(max(n_out, 1)):
        zout_ref[pl.ds(k * Hp, Hp), :] = z0

    def cond(carry):
        t, _dt, attempted, cnt = carry
        return (t < t1) & (attempted < max_steps) & (cnt < cap)

    def body(carry):
        t, dt, attempted, cnt = carry
        z = z_scr[:, :]
        k1 = k1_scr[:, :]
        dt = jnp.maximum(dt, 1e-14)
        dt_c = jnp.minimum(dt, t1 - t)

        ks = [k1]
        for alpha_i, beta_i in zip(_ALPHA, _BETA):
            y = z
            for q, coef in enumerate(beta_i):
                if coef != 0.0:
                    y = y + (dt_c * coef) * ks[q]
            ks.append(f_eval(y, t + alpha_i * dt_c))
        z1 = z
        for q, coef in enumerate(_CSOL):
            if coef != 0.0:
                z1 = z1 + (dt_c * coef) * ks[q]
        err = jnp.zeros_like(z)
        for q, coef in enumerate(_CERR):
            if coef != 0.0:
                err = err + coef * ks[q]
        err = dt_c * err

        ratio = _masked_error_ratio(err, z, z1, rtol, atol, mask, norm_count)
        accept = ratio <= 1.0

        # integrate.py's controller: clip(safety * ratio^(-1/order),
        # dfactor, ifactor-if-accepted), and a clamped-short accepted step
        # doesn't shrink the carried proposal.
        ratio_s = jnp.maximum(ratio, 1e-10)
        factor = safety * jnp.exp((-1.0 / _ORDER) * jnp.log(ratio_s))
        factor = jnp.where(jnp.isfinite(factor), factor, dfactor)
        upper = jnp.where(accept, ifactor, 1.0)
        dt_new = dt_c * jnp.clip(factor, dfactor, upper)
        was_clamped = dt_c < dt
        dt_new = jnp.where(accept & was_clamped, jnp.maximum(dt, dt_new), dt_new)

        @pl.when(accept)
        def _():
            # Trajectory store for the backward mesh walk; z lives in the
            # z_scr VMEM scratch (not yet advanced), DMA'd to the HBM store.
            dma = pltpu.make_async_copy(
                z_scr, zst_ref.at[pl.ds(cnt * Hp, Hp), :], dma_sem)
            dma.start()
            dma.wait()
            tst_ref[pl.ds(cnt, 1), :] = jnp.full((1, 128), t, jnp.float32)
            dtst_ref[pl.ds(cnt, 1), :] = jnp.full((1, 128), dt_c, jnp.float32)
            # Dense output at the static output times inside (t, t + dt_c].
            y_mid = z
            for q, coef in enumerate(_BMID):
                if coef != 0.0:
                    y_mid = y_mid + (dt_c * coef) * ks[q]
            for k in range(n_out):
                ts_k = jnp.float32(out_ts[k])

                @pl.when((ts_k > t) & (ts_k <= t + dt_c))
                def _(k=k, ts_k=ts_k, y_mid=y_mid):
                    theta = jnp.clip((ts_k - t) / jnp.maximum(dt_c, 1e-30),
                                     0.0, 1.0)
                    cA, cB, cC = _dense_coeffs(theta)
                    rA = z1 - z - dt_c * ks[0]
                    rB = dt_c * (ks[-1] - ks[0])
                    rC = y_mid - z - 0.5 * dt_c * ks[0]
                    val = z + theta * dt_c * ks[0] + cA * rA + cB * rB + cC * rC
                    zout_ref[pl.ds(k * Hp, Hp), :] = val

            z_scr[:, :] = z1
            k1_scr[:, :] = ks[-1]

        t_new = jnp.where(accept, t + dt_c, t)
        cnt_new = cnt + accept.astype(jnp.int32)
        return (t_new, dt_new, attempted + 1, cnt_new)

    dt0 = dt0_ref[0, 0]
    zero = jnp.zeros((), jnp.int32)
    _t, dt_fin, attempted, cnt = jax.lax.while_loop(
        cond, body, (t0, dt0, zero, zero)
    )
    cnt_ref[0, 0] = cnt
    zfin_ref[:, :] = z_scr[:, :]
    dtfin_ref[0, 0] = dt_fin

    # Loud exhaustion, matching the XLA drivers (integrate.py): the loop
    # exits with t >= t1 iff it converged, so t < t1 here means the step or
    # store budget ran out — poison the outputs (and the carried state, so
    # later chunks propagate it) instead of returning a silently-truncated
    # trajectory.
    @pl.when(_t < t1)
    def _():
        zout_ref[:, :] = jnp.full_like(zout_ref[:, :], jnp.nan)
        zfin_ref[:, :] = jnp.full_like(zfin_ref[:, :], jnp.nan)


def _dopri_bwd_kernel(ct_ref, zst_ref, tst_ref, dtst_ref, cnt_ref, gz_ref,
                      gzfin_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      dct_ref, dz0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      lam_scr, emit_scr, zvm_scr, dma_sem,
                      *, out_ts, t0g, w, n, C, H, linear=False, lead=False):
    CHp = w2_ref.shape[0]
    Hp = dz0_ref.shape[0]
    tile = dz0_ref.shape[1]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    n_out = len(out_ts)

    dct_ref[:, :] = jnp.zeros_like(dct_ref)
    dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
    db1_ref[:, :] = jnp.zeros_like(db1_ref)
    dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
    db2_ref[:, :] = jnp.zeros_like(db2_ref)
    # lambda at the chunk's end = cotangent of the carried-out state (zero
    # for the final chunk; the next chunk's dz0 when chained).
    lam_scr[:, :] = gzfin_ref[:, :]
    emit_scr[:, :] = jnp.zeros_like(emit_scr)  # (1, n_out_pad) emitted flags

    cnt = cnt_ref[0, 0]

    def stage_eval(y, tval):
        slab, fr, j = _slab_at(ct_ref, tval, t0g, w, n, left=linear,
                               lead=lead)
        k, _h1, _g, _dx = _stage_forward(y, fr, slab, w1t, b1, w2t, b2,
                                         rep, sel, C, H, linear=linear)
        # Save only the THIN stage inputs (y: Hp rows, plus lane scalars);
        # the VJP recomputes h1/g/dx from y below.  Measured on v5e at
        # batch 4096: keeping the fat (h1, g, dx) activations instead is
        # 0 to 2% SLOWER despite ~20% fewer MXU flops — the reverse walk is
        # not flop-bound — while costing 7x(W + CHp) rows/lane of VMEM.
        return k, (y, fr, j)

    def stage_vjp(u, saved):
        y, fr, j = saved
        slab = ct_ref[pl.ds(j * _SLAB, _SLAB), :]
        _k, h1, g, dx = _stage_forward(y, fr, slab, w1t, b1, w2t, b2,
                                       rep, sel, C, H, linear=linear)
        dy, dw1t, db1_, dw2t, db2_, ddx = _stage_backward(
            u, y, fr, h1, g, dx, w1t, w2t, rep, sel, C, H)
        dw1_ref[:, :] += dw1t
        db1_ref[:, :] += db1_
        dw2_ref[:, :] += dw2t
        db2_ref[:, :] += db2_
        if linear:
            # Slope rows only: d(slope_j) accumulates ddx directly.
            upd = jnp.concatenate(
                [ddx, jnp.zeros((_SLAB - C, ddx.shape[1]), ddx.dtype)],
                axis=0)
        else:
            upd = jnp.concatenate(
                [ddx, fr * ddx, (fr * fr) * ddx,
                 jnp.zeros((_SLAB - 3 * C, ddx.shape[1]), ddx.dtype)], axis=0)
        old = dct_ref[pl.ds(j * _SLAB, _SLAB), :]
        dct_ref[pl.ds(j * _SLAB, _SLAB), :] = old + upd
        return dy

    def body(i, _):
        s = cnt - 1 - i
        dma = pltpu.make_async_copy(
            zst_ref.at[pl.ds(s * Hp, Hp), :], zvm_scr, dma_sem)
        dma.start()
        dma.wait()
        z = zvm_scr[:, :]
        t = tst_ref[pl.ds(s, 1), :][0, 0]
        dt = dtst_ref[pl.ds(s, 1), :][0, 0]

        ks, saved = [], []
        for stg in range(_NSTAGES):
            y = z
            if stg:
                for q, coef in enumerate(_BETA[stg - 1]):
                    if coef != 0.0:
                        y = y + (dt * coef) * ks[q]
            tval = t if stg == 0 else t + _ALPHA[stg - 1] * dt
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

        lam = lam_scr[:, :]  # dL/d z_{s+1}
        lam_z = jnp.zeros_like(lam)
        lam_z1 = lam
        seeds = [jnp.zeros_like(lam) for _ in range(_NSTAGES)]
        u_mid = jnp.zeros_like(lam)

        # Dense-output cotangents for output times emitted inside this step.
        for k in range(n_out):
            ts_k = jnp.float32(out_ts[k])
            hit = (ts_k > t) & (ts_k <= t + dt)
            gk = gz_ref[pl.ds(k * Hp, Hp), :]
            theta = jnp.clip((ts_k - t) / jnp.maximum(dt, 1e-30), 0.0, 1.0)
            cA, cB, cC = _dense_coeffs(theta)
            hitf = hit.astype(jnp.float32)
            gku = gk * hitf
            lam_z = lam_z + (1.0 - cA - cC) * gku
            lam_z1 = lam_z1 + cA * gku
            seeds[0] = seeds[0] + (dt * (theta - cA - cB - 0.5 * cC)) * gku
            seeds[-1] = seeds[-1] + (dt * cB) * gku
            u_mid = u_mid + cC * gku
            # Record emission so unemitted rows' cotangents flow to z0.
            prev = emit_scr[0:1, pl.ds(k, 1)]
            emit_scr[0:1, pl.ds(k, 1)] = jnp.maximum(prev, hitf[None, None])

        # y_mid = z + dt*sum bmid_i k_i;  z1 = z + dt*sum c_sol_i k_i.
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
            v[stg] = stage_vjp(u, saved[stg])
        for stg in range(_NSTAGES):
            lam_z = lam_z + v[stg]

        lam_scr[:, :] = lam_z
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)

    # dz0 = lambda at the chunk start + cotangents of output rows never
    # emitted (they retained their chunk-entry initialisation).
    dz0 = lam_scr[:, :]
    for k in range(n_out):
        miss = 1.0 - emit_scr[0:1, pl.ds(k, 1)][0, 0]
        dz0 = dz0 + miss * gz_ref[pl.ds(k * Hp, Hp), :]
    dz0_ref[:, :] = dz0


@functools.lru_cache(maxsize=64)
def _make_fused_dopri(n, tile, out_ts, t_start, t_end, t0g, w, rtol, atol,
                      max_steps, cap, C, H, W, CHp, B, safety, ifactor,
                      dfactor, interpret, linear=False, lead=False):
    """One chunk solve [t_start, t_end] over an n-interval coefficient table.

    Returns (zout, zfin, dtfin): dense output at ``out_ts`` (rows of z0 for
    times outside the realised mesh), the carried-out state, and the step
    proposal at exit (mesh data — feed it to the next chunk through
    stop_gradient)."""
    Hp = _round_up(H, 8)
    n_out = len(out_ts)
    n_out_rows = max(n_out, 1)
    n_out_pad = _round_up(n_out_rows, _LANES)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)

    fwd_call = pl.pallas_call(
        functools.partial(
            _dopri_fwd_kernel, out_ts=out_ts, t_start=t_start, t_end=t_end,
            t0g=t0g, w=w, n=n, rtol=rtol, atol=atol,
            max_steps=max_steps, cap=cap, C=C, H=H, B=B, safety=safety,
            ifactor=ifactor, dfactor=dfactor, linear=linear, lead=lead),
        out_shape=(
            jax.ShapeDtypeStruct((n_out_rows * Hp, tile), jnp.float32),  # zout
            jax.ShapeDtypeStruct((Hp, tile), jnp.float32),          # z final
            jax.ShapeDtypeStruct((1, 1), jnp.float32),              # dt final
            jax.ShapeDtypeStruct((cap * Hp, tile), jnp.float32),    # z store (HBM)
            jax.ShapeDtypeStruct((cap, 128), jnp.float32),          # t store
            jax.ShapeDtypeStruct((cap, 128), jnp.float32),          # dt store
            jax.ShapeDtypeStruct((1, 1), jnp.int32),                # count
        ),
        in_specs=[vspec] * 6 + [smem_scalar],
        out_specs=(vspec, vspec, smem_scalar, hbm, vspec, vspec, smem_scalar),
        scratch_shapes=[pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)}),
    )

    bwd_call = pl.pallas_call(
        functools.partial(_dopri_bwd_kernel, out_ts=out_ts, t0g=t0g, w=w, n=n,
                          C=C, H=H, linear=linear, lead=lead),
        out_shape=(
            jax.ShapeDtypeStruct((n * _SLAB, tile), jnp.float32),  # dct
            jax.ShapeDtypeStruct((Hp, tile), jnp.float32),         # dz0
            jax.ShapeDtypeStruct((W, Hp), jnp.float32),
            jax.ShapeDtypeStruct((W, 1), jnp.float32),
            jax.ShapeDtypeStruct((CHp, W), jnp.float32),
            jax.ShapeDtypeStruct((CHp, 1), jnp.float32),
        ),
        in_specs=[vspec, hbm, vspec, vspec, smem_scalar] + [vspec] * 6,
        out_specs=(vspec,) * 6,
        scratch_shapes=[pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((1, n_out_pad), jnp.float32),
                        pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)}),
    )

    @jax.custom_vjp
    def solve(ct2, z0t, w1t, b1, w2t, b2, dt0):
        zout, zfin, dtfin, _zs, _t, _dt, _c = fwd_call(
            ct2, z0t, w1t, b1, w2t, b2, dt0)
        return zout, zfin, dtfin

    def solve_fwd(ct2, z0t, w1t, b1, w2t, b2, dt0):
        zout, zfin, dtfin, zs, tst, dtst, c = fwd_call(
            ct2, z0t, w1t, b1, w2t, b2, dt0)
        return (zout, zfin, dtfin), (ct2, z0t, w1t, b1, w2t, b2, zs, tst,
                                     dtst, c)

    def solve_bwd(res, cotangents):
        gz, gzfin, _gdtfin = cotangents  # dt proposal is mesh, not value
        ct2, z0t, w1t, b1, w2t, b2, zs, tst, dtst, c = res
        dct, dz0, dw1, db1, dw2, db2 = bwd_call(
            ct2, zs, tst, dtst, c, gz, gzfin, w1t, b1, w2t, b2)
        zero_dt = jnp.zeros((1, 1), jnp.float32)
        return dct, dz0, dw1, db1, dw2, db2, zero_dt

    solve.defvjp(solve_fwd, solve_bwd)
    solve._fwd_call = fwd_call  # exposed for tests/debugging (step counts)
    return solve


def _chunk_plan(grid, ts_np, max_intervals=MAX_INTERVALS):
    """Splits the knot grid into interval chunks of <= max_intervals and
    routes each output time (after ts[0]) to the chunk whose span contains
    it.  Returns a list of (j0, j1, t_start, t_end, out_ts, out_idx)."""
    n = grid.shape[0] - 1
    t0, tN = float(ts_np[0]), float(ts_np[-1])
    chunks = []
    prev_end = t0
    j0 = 0
    while j0 < n:
        j1 = min(j0 + max_intervals, n)
        start = float(grid[j0]) if j0 > 0 else min(t0, float(grid[0]))
        end = float(grid[j1]) if j1 < n else max(tN, float(grid[n]))
        if end <= t0 + 0.0:      # chunk entirely before the solve begins
            j0 = j1
            continue
        if start >= tN:          # chunk entirely after the solve ends
            break
        t_start = max(start, t0)
        t_end = min(end, tN)
        out_idx = [
            k for k in range(1, len(ts_np))
            if prev_end < ts_np[k] <= t_end
        ]
        out_ts = tuple(float(ts_np[k]) for k in out_idx)
        chunks.append((j0, j1, t_start, t_end, out_ts, tuple(out_idx)))
        prev_end = t_end
        j0 = j1
        if t_end >= tN:
            break
    return chunks


def try_fused_dopri5(X, func, z0, ts, cfg):
    """Attempt the fused adaptive dopri5 solve.

    Requires: MLPVectorField over a CubicSpline OR a LinearInterpolation
    with a concrete uniform knot grid (the Neural RDE / log-ODE training
    control, reference example/logsignature_example.py:26), concrete output
    times, f32 or bf16 (bf16 solves in f32 internally,
    the shared _pack_operands dtype policy), no step_size
    (tolerance-controlled), single device.  Batches larger than the chosen
    tile run as independent per-group solves and long coefficient tables
    stream as carried chunks sized to VMEM (see module docstring for the
    controller semantics).  Returns the time-leading solution at ``ts`` or
    None.
    """
    from ..interpolation.cubic import CubicSpline
    from ..interpolation.linear import LinearInterpolation
    from . import fused_pallas
    from .integrate import select_initial_step
    from .terms import MLPVectorField, make_cde_rhs

    interpret = fused_pallas._kernel_mode()
    if interpret is None:
        return None

    if not isinstance(func, MLPVectorField) or isinstance(z0, (tuple, list)):
        return None
    if isinstance(X, CubicSpline):
        # b + (2c + 3d*fr)*fr monomial slabs; knot-continuous derivative.
        rows_src = (X._b, X._two_c, X._three_d)
        linear = False
    elif isinstance(X, LinearInterpolation):
        # Piecewise-constant derivative: slabs hold only the C slope rows
        # (admitting up to 16 channels — the depth-3 log-ODE control's 14),
        # and interval selection is LEFT-continuous at knots to reproduce
        # the reference's bucketize convention
        # (interpolation_linear.py:203-210) — see _slab_at(left=True).
        rows_src = (X._derivs, None, None)
        linear = True
    else:
        return None
    grid = X.grid_points
    if not isinstance(grid, np.ndarray) or grid.shape[0] < 2:
        return None
    from ..utils.misc import is_concrete

    if isinstance(ts, np.ndarray):
        ts_np = ts.astype(np.float64)
    elif is_concrete(ts):
        ts_np = np.asarray(ts, dtype=np.float64)
    else:
        return None
    spans = np.diff(grid.astype(np.float64))
    if not np.allclose(spans, spans[0], rtol=1e-9, atol=1e-12):
        return None
    w = float(spans[0])
    n = grid.shape[0] - 1

    # The trajectory store bounds each chunk's step budget.  A caller who
    # explicitly asks for a larger budget than the store gets the XLA path
    # (which honors it) instead of a silently smaller one; the default budget
    # is the store cap, far above any sane solve at these tolerances.
    if cfg.max_steps is not None and cfg.max_steps > _STORE_CAP:
        return None
    max_steps = min(cfg.max_steps or 4096, _STORE_CAP)

    # Validate field/dtype shapes once (full batch); per-group packing below.
    p_full = fused_pallas._pack_operands(rows_src[0], rows_src[1],
                                         rows_src[2], z0, func, n,
                                         linear=linear)
    if p_full is None:
        return None

    def chunk_cap(n_c):
        # Knot-derived per-chunk step budget (sizes the t/dt VMEM stores):
        # ~64 attempts per interval plus slack is far beyond any sane solve
        # at these tolerances, and exhaustion stays LOUD (NaN poison).  The
        # full-table chunk recovers the caller's budget exactly.
        return min(max_steps, 256 + 64 * n_c)

    def vmem_bytes(chunks, tile):
        # Mosaic scoped-VMEM model for the BACKWARD kernel (the larger of
        # the two), CALIBRATED against measured compiles on v5e at these
        # field shapes (H=8, C=3, W=128):
        #   (2048, n_c=32, cap=1280) -> 18.04 MB, (2048, 48) -> 22.04 MB,
        #   (4096, 8, 768) -> 23.73 MB, (4096, 16) -> 27.73 MB
        # i.e. per-lane fixed cost ~4.7 KB (the unrolled 7-stage reverse
        # walk's live vectors + transients), ~0.7 KB per trajectory-store
        # row, and exactly 2 * _SLAB * 4 bytes/lane per chunk interval
        # (ct + dct blocks, single-buffered).  Larger W/CHp scale the
        # per-lane term through the transient h1/dpre rows.
        max_chunk_n = max(c[1] - c[0] for c in chunks) + int(bool(linear))
        max_chunk_out = max(max(len(c[4]), 1) for c in chunks)
        max_cap = max(chunk_cap(c[1] - c[0]) for c in chunks)
        per_lane_fixed = 4 * (
            30 * p_full.Hp                       # ks/seeds/v/lam/z vectors
            + 7 * p_full.C
            + 2 * max_chunk_out * p_full.Hp      # gz + out cotangent rows
            + 6 * (p_full.W + p_full.CHp)        # stage transients (meas.)
        )
        return (
            tile * (per_lane_fixed + 2 * max_chunk_n * _SLAB * 4)
            + max_cap * 700
            + 4 * p_full.W * (p_full.Hp + p_full.CHp + 2)
        )

    # Widest tile first (chunking the time axis keeps the total step count at
    # ~one solve's worth; narrowing the tile multiplies it), then shrink the
    # chunk length until the residency fits; shrink the tile only when even
    # 4-interval chunks cannot fit, and decline rather than hand Mosaic a
    # program that cannot allocate.
    tile = min(_round_up(max(p_full.B, 1), _LANES), MAX_TILE)
    chunks = None
    while chunks is None:
        n_int = min(MAX_INTERVALS, n)
        while True:
            trial = _chunk_plan(grid, ts_np, n_int)
            if not trial:
                return None
            if any(len(c[4]) > MAX_OUT_TIMES for c in trial):
                return None
            if vmem_bytes(trial, tile) <= _VMEM_BUDGET:
                chunks = trial
                break
            if n_int <= 4:
                break
            n_int = max(4, n_int // 2)
        if chunks is None:
            if tile <= _LANES:
                return None
            tile = _round_up(tile // 2, _LANES)

    # A caller who EXPLICITLY set max_steps must get that budget per chunk:
    # if VMEM pressure shrank the chunks below the knot-derived cap that
    # honors it, decline to the XLA path (which always honors the budget)
    # rather than silently lowering it — a stiff-but-convergent solve within
    # the requested budget must not NaN-poison here when XLA would succeed.
    # The default budget keeps chunk_cap (far above any sane solve).
    if cfg.max_steps is not None and any(
            chunk_cap(c[1] - c[0]) < cfg.max_steps for c in chunks):
        return None

    # Hairer initial-step heuristic, identical to the XLA path (3 dispatched
    # vector-field evaluations — negligible next to the fused solve).  Runs
    # on the batch-SHAPED state: X still carries the original batch dims, so
    # the flattened (B, H) state would not broadcast against X.derivative.
    rhs = make_cde_rhs(func, X)
    t0 = jnp.asarray(ts_np[0], jnp.float32)
    z0b = jnp.broadcast_to(z0, p_full.batch + z0.shape[-1:])
    f0 = rhs(t0, z0b)
    dt0_full = select_initial_step(rhs, t0, z0b, _ORDER, cfg.rtol, cfg.atol, f0)
    dt0_full = jax.lax.stop_gradient(dt0_full).astype(jnp.float32).reshape(1, 1)

    # Flatten batch; groups of <= tile lanes solve independently.
    B = p_full.B
    batch_shape = p_full.batch
    H = p_full.H
    C = p_full.C
    rows_flat = tuple(
        None if r is None
        else jnp.broadcast_to(r, batch_shape + r.shape[-2:]).reshape(B, n, C)
        for r in rows_src
    )
    z0_flat = jnp.broadcast_to(z0, batch_shape + (H,)).reshape(B, H)

    n_out_total = len(ts_np)
    group_outs = []
    for g0 in range(0, B, tile):
        g1 = min(g0 + tile, B)
        p = fused_pallas._pack_operands(
            rows_flat[0][g0:g1],
            None if linear else rows_flat[1][g0:g1],
            None if linear else rows_flat[2][g0:g1],
            z0_flat[g0:g1], func, n, single_tile=tile, linear=linear)
        if p is None:
            return None

        z_carry = p.z0t
        dt_carry = dt0_full
        out_rows = [None] * n_out_total
        out_rows[0] = p.z0t
        for (j0, j1, t_start, t_end, out_ts, out_idx) in chunks:
            n_c = j1 - j0
            cap_c = chunk_cap(n_c)
            # Linear controls: chunks after the first carry ONE extra
            # interval to the left so stages landing exactly on the chunk
            # boundary keep the left-continuous slope (see _slab_at lead).
            lead = bool(linear and j0 > 0)
            ct_chunk = jax.lax.dynamic_slice_in_dim(
                p.ct2, (j0 - int(lead)) * _SLAB,
                (n_c + int(lead)) * _SLAB, axis=0)
            solve = _make_fused_dopri(
                n_c + int(lead), p.Bp, out_ts, t_start, t_end,
                float(grid[j0]), w,
                float(cfg.rtol), float(cfg.atol), int(cap_c), int(cap_c),
                C, H, p.W, p.CHp, p.B, float(cfg.safety), float(cfg.ifactor),
                float(cfg.dfactor), interpret, linear, lead)
            zout, z_carry, dt_fin = solve(
                ct_chunk, z_carry, p.w1t, p.b1c, p.w2t, p.b2c, dt_carry)
            # The carried proposal is mesh data like dt0 (stop_gradient'd
            # above); its cotangent is discarded by solve_bwd anyway.
            dt_carry = jax.lax.stop_gradient(dt_fin)
            if out_idx:
                z3 = zout.reshape(len(out_idx), p.Hp, p.Bp)
                for row, k in enumerate(out_idx):
                    out_rows[k] = z3[row]

        stacked = jnp.stack(out_rows, axis=0)  # (n_out, Hp, Bp)
        group_outs.append(stacked[:, :H, :p.B])

    out = jnp.concatenate(group_outs, axis=-1)  # (n_out, H, B)
    out = jnp.moveaxis(out, 1, -1).reshape((n_out_total,) + batch_shape + (H,))
    return out.astype(p_full.out_dtype)
