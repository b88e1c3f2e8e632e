"""Fully-fused Pallas TPU kernel for fixed-step Neural CDE solves.

The flagship workload (reference example/time_series_classification.py:130-166:
cubic control + MLP vector field + fixed-step RK) spends its time in ~400
*sequential* tiny matmuls: measured on a v5e chip, each z@W1 / h@W2 pair costs
~5.8us of which ~4.6us is fixed per-op overhead (4x the batch costs only 1.6x
the time).  XLA cannot remove that overhead because every solver stage is a
separate HLO; this kernel runs the ENTIRE solve — every interval, substep and
RK stage — inside one Pallas program, so the MXU sees back-to-back matmuls
with no dispatch gaps, and intermediate activations never touch HBM.

Layout: batch rides the VPU *lanes* (arrays are (feature, batch_tile)), so
every matmul is (out_features, K) @ (K, tile) — full 128-lane tiles regardless
of how small the CDE's channel counts are.  The grid is
(batch_tiles, intervals); the hidden state carries across the interval axis in
a VMEM scratch that is reset when a new batch tile begins.

The backward pass is a second Pallas kernel walking the interval grid in
reverse (index_map ``(i, jr) -> (n-1-jr, i)``), recomputing each interval's
stages from the forward pass's stored knot states (O(L*H) residual memory, not
O(L*W*stages)) and accumulating weight/coefficient gradients in VMEM scratch.
Gradient flow matches direct backprop through the step scan exactly: grads
reach z0, the MLP parameters, and the spline coefficients (the contract of
reference test/test_tricks.py:21-49).

The contraction f(z) . dX/dt and its transpose are expressed with two
selection matrices so they run on the MXU in the lane layout:
``k = SEL @ (g * (REP @ dx))`` where ``REP`` tiles the C control channels
across the C*H vector-field columns and ``SEL`` sums each hidden row's C
products.
"""

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SLAB = 16  # coefficient slab rows per interval (3*C <= 16 padded to a sublane tile)

# Applicability caps: sized so the working set (weights + S stage activations
# at the widest tile) stays far under the ~16MB VMEM.
MAX_WIDTH = 512
MAX_CONTRACT = 512  # C * H
MAX_SUBSTEPS = 8

# Batch-tile caps.  The solve is a serial chain of small matmuls (K = Hp or
# W), so per-op MXU pipeline latency — not throughput — bounds it; wider
# lanes amortise that fixed latency over more batch.  The backward tile is
# smaller because the reverse walk holds every stage's (y, h1, g, dx) saved
# activations live at once (~2.6 KB/lane for the flagship shapes); the
# forward keeps only z and one stage in flight.
MAX_TILE_FWD = 4096
MAX_TILE_BWD = 2048

# None: use the kernel when running on TPU.  True: force (interpret mode off
# TPU — used by the CPU equivalence tests).  False: never.
_FORCE = None

# Thread-local trace-scoped disable: contexts that must not dispatch the
# whole-batch kernels (e.g. the per-lane vmap of per-sample stepping) use
# this instead of mutating the user-facing _FORCE hook, so a user's explicit
# force_fused_pallas(True) survives and concurrent traces in other threads
# are unaffected.
_TLS = threading.local()


class disable_fused_dispatch:
    """Context manager: decline the fused kernels for dispatches traced in
    this thread while active (nestable)."""

    def __enter__(self):
        self._prev = getattr(_TLS, "disable", 0)
        _TLS.disable = self._prev + 1
        return self

    def __exit__(self, *exc):
        _TLS.disable = self._prev
        return False


def force_fused_pallas(mode):
    """Test hook: None = auto (TPU only), True = force (interpreted off-TPU),
    False = disable."""
    global _FORCE
    _FORCE = mode


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _round_up(x, m):
    return -(-x // m) * m


def _selection_matrices(C, H, CHp, dtype):
    """REP (CHp, C): REP[i*H+h, i] = 1 — tiles dx across vector-field columns.
    SEL (Hp, CHp): SEL[h, i*H+h] = 1 — sums each hidden row's C products."""
    CH = C * H
    Hp = _round_up(H, 8)
    q = jax.lax.broadcasted_iota(jnp.int32, (CHp, C), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (CHp, C), 1)
    rep = ((q // H == i) & (q < CH)).astype(dtype)
    hh = jax.lax.broadcasted_iota(jnp.int32, (Hp, CHp), 0)
    qq = jax.lax.broadcasted_iota(jnp.int32, (Hp, CHp), 1)
    sel = ((qq % H == hh) & (qq < CH)).astype(dtype)
    return rep, sel


def _rep_rows(x, C, H):
    """(C, T) -> (C*H, T): rows i*H..(i+1)*H = x[i] — the matrix-free form
    of ``REP @ x`` as C sublane broadcasts (no MXU dot).  Requires H % 8 == 0
    so every block is whole sublane tiles."""
    return jnp.concatenate(
        [jnp.broadcast_to(x[i:i + 1], (H,) + x.shape[1:]) for i in range(C)],
        axis=0)


def _sel_sum(x, C, H):
    """(C*H, T) -> (H, T): out[h] = sum_i x[i*H + h] — ``SEL @ x`` as C-1
    sublane-aligned adds."""
    acc = x[0:H]
    for i in range(1, C):
        acc = acc + x[i * H:(i + 1) * H]
    return acc


def _chan_sum(x, C, H):
    """(C*H, T) -> (C, T): out[i] = sum_h x[i*H + h] — ``REP.T @ x`` as C
    sublane reductions."""
    return jnp.concatenate(
        [jnp.sum(x[i * H:(i + 1) * H], axis=0, keepdims=True)
         for i in range(C)], axis=0)


def _dot(a, b, mx=jnp.float32):
    """MXU matmul with f32 accumulation; ``mx`` is the operand dtype fed to
    the systolic array.  bf16 operands take the MXU's native rate (f32
    matmuls decompose into multiple bf16 passes on v5e); the f32
    accumulation keeps the serial solve's carried state exact."""
    return jnp.dot(a.astype(mx), b.astype(mx),
                   preferred_element_type=jnp.float32)


def _stage_forward(y, fr, slab, w1t, b1, w2t, b2, rep, sel, C, H,
                   mx=jnp.float32, linear=False):
    """One vector-field evaluation in lane layout.  y: (Hp, tile).

    ``rep``/``sel`` None means the matrix-free selection path: when
    H % 8 == 0 the REP/SEL products are sublane broadcasts/adds on the VPU
    instead of MXU dots — the kernel's runtime scales with its *count* of
    serial small matmuls (measured: bf16 operands change nothing, so the
    MXU ops are latency- not throughput-bound), and this removes 2 of the
    4 per-stage dots.

    ``linear=True``: the slab holds a piecewise-constant derivative
    (LinearInterpolation slopes in rows 0:C, rows C:_SLAB padding), so only
    C slab rows are live — which is what lets C up to _SLAB = 16 channels
    fuse (the cubic monomial form needs 3*C rows), covering the depth-3
    log-ODE control's 14 channels."""
    if linear:
        dx = slab[0:C]
    else:
        dx = slab[0:C] + (slab[C : 2 * C] + slab[2 * C : 3 * C] * fr) * fr
    h1 = jnp.maximum(_dot(w1t, y, mx) + b1, 0.0)
    g = jnp.tanh(_dot(w2t, h1, mx) + b2)
    if rep is None:
        k = _sel_sum(g * _rep_rows(dx, C, H), C, H)
    else:
        k = _dot(sel, g * _dot(rep, dx, mx), mx)
    return k, h1, g, dx


def _fwd_kernel(ct_ref, z0_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                zres_ref, zscr, *, tableau, m, dt_sub, C, H, out_knots,
                mx=jnp.float32):
    alpha, beta, c_sol = tableau
    stage_times = (0.0,) + tuple(alpha)
    n_stages = len(c_sol)
    j = pl.program_id(1)
    Hp = z0_ref.shape[0]

    @pl.when(j == 0)
    def _():
        zscr[:, :] = z0_ref[:, :]

    CHp = w2_ref.shape[0]
    rep = sel = None
    if H % 8:  # padded layout: selection products stay MXU dots
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    slab = ct_ref[:, :].astype(jnp.float32)
    z = zscr[:, :]

    for s in range(m):
        base = s * dt_sub
        ks = []
        for stg in range(n_stages):
            y = z
            if stg:
                for q, coef in enumerate(beta[stg - 1]):
                    if coef != 0.0:
                        y = y + (dt_sub * coef) * ks[q]
            fr = base + stage_times[stg] * dt_sub
            k, _h1, _g, _dx = _stage_forward(y, fr, slab, w1t, b1, w2t, b2,
                                             rep, sel, C, H, mx)
            ks.append(k)
        for q, coef in enumerate(c_sol):
            if coef != 0.0:
                z = z + (dt_sub * coef) * ks[q]

    zscr[:, :] = z
    zres_ref[:, :] = z
    # Requested output knots land in the resident out block (index map
    # constant in j, so it flushes once per batch tile): knot k is the state
    # after interval k - 1.  Knot 0 (= z0) is assembled by the caller.
    for k, knot in enumerate(out_knots):
        @pl.when(j == knot - 1)
        def _(k=k):
            out_ref[pl.ds(k * Hp, Hp), :] = z


def _dg(a, b, dims, mx=jnp.float32):
    return jax.lax.dot_general(a.astype(mx), b.astype(mx), dims,
                               preferred_element_type=jnp.float32)


def _stage_backward(u, y, fr, h1, g, dx, w1t, w2t, rep, sel, C, H,
                    mx=jnp.float32):
    """VJP of one vector-field evaluation.  u: cotangent of k, (Hp, tile).

    Returns (dy, dw1t, db1, dw2t, db2, ddx)."""
    if rep is None:
        dxrep = _rep_rows(dx, C, H)
        urep = jnp.concatenate([u] * C, axis=0)   # SEL.T @ u
        dg = urep * dxrep
        ddx = _chan_sum(urep * g, C, H)           # REP.T @ (urep * g)
    else:
        dxrep = _dot(rep, dx, mx)
        urep = _dot(sel.T, u, mx)
        dg = urep * dxrep
        ddx = _dot(rep.T, urep * g, mx)
    dpre2 = dg * (1.0 - g * g)
    # dw2t (CHp, W) = dpre2 (CHp, tile) . h1 (W, tile) contracted over tile.
    dw2t = _dg(dpre2, h1, (((1,), (1,)), ((), ())), mx)
    db2 = jnp.sum(dpre2, axis=1, keepdims=True)
    # dh1 (W, tile) = w2t^T @ dpre2, contracted over CHp.
    dh1 = _dg(w2t, dpre2, (((0,), (0,)), ((), ())), mx)
    dpre1 = dh1 * (h1 > 0.0).astype(h1.dtype)
    dw1t = _dg(dpre1, y, (((1,), (1,)), ((), ())), mx)
    db1 = jnp.sum(dpre1, axis=1, keepdims=True)
    dy = _dg(w1t, dpre1, (((0,), (0,)), ((), ())), mx)
    return dy, dw1t, db1, dw2t, db2, ddx


def _bwd_kernel(ct_ref, zres_ref, z0_ref, gz_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, dct_ref, dz0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                lam_scr, dw1_acc, db1_acc, dw2_acc, db2_acc,
                *, tableau, m, dt_sub, C, H, n, out_knots, mx=jnp.float32):
    alpha, beta, c_sol = tableau
    stage_times = (0.0,) + tuple(alpha)
    n_stages = len(c_sol)
    jr = pl.program_id(1)
    Hp = z0_ref.shape[0]

    @pl.when(jr == 0)
    def _():
        lam_scr[:, :] = jnp.zeros_like(lam_scr)
        dw1_acc[:, :] = jnp.zeros_like(dw1_acc)
        db1_acc[:, :] = jnp.zeros_like(db1_acc)
        dw2_acc[:, :] = jnp.zeros_like(dw2_acc)
        db2_acc[:, :] = jnp.zeros_like(db2_acc)

    CHp = w2_ref.shape[0]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    slab = ct_ref[:, :].astype(jnp.float32)
    # Walking interval j = n - 1 - jr: fold in the cotangent of any requested
    # output knot sitting at this interval's END (knot j + 1 hits at
    # jr == n - knot).  The gz block holds only the *requested* knots' rows —
    # the full-trajectory cotangent array this replaces was pure HBM waste
    # when (as in training) only the terminal state feeds the loss.
    lam = lam_scr[:, :]
    for k, knot in enumerate(out_knots):
        hit = (jr == n - knot).astype(jnp.float32)
        lam = lam + hit * gz_ref[pl.ds(k * Hp, Hp), :]

    def run_stages(y0, base, save):
        ks, ys, h1s, gs, dxs = [], [], [], [], []
        for stg in range(n_stages):
            y = y0
            if stg:
                for q, coef in enumerate(beta[stg - 1]):
                    if coef != 0.0:
                        y = y + (dt_sub * coef) * ks[q]
            fr = base + stage_times[stg] * dt_sub
            k, h1, g, dx = _stage_forward(y, fr, slab, w1t, b1, w2t, b2,
                                          rep, sel, C, H, mx)
            ks.append(k)
            if save:
                ys.append(y)
                h1s.append(h1)
                gs.append(g)
                dxs.append(dx)
        return ks, ys, h1s, gs, dxs

    def substep_out(z, ks):
        for q, coef in enumerate(c_sol):
            if coef != 0.0:
                z = z + (dt_sub * coef) * ks[q]
        return z

    # Interval j's entry state is knot j: residual row j - 1 (the shifted
    # reverse index map), or z0 for the earliest interval — no XLA-level
    # concat of (z0, shifted residuals) ever materialises.
    zin = jnp.where(jr == n - 1, z0_ref[:, :], zres_ref[:, :])
    # Recompute the substep chain z_0..z_{m-1} from the stored knot state.
    zs = [zin]
    for s in range(m - 1):
        ks, _, _, _, _ = run_stages(zs[-1], s * dt_sub, save=False)
        zs.append(substep_out(zs[-1], ks))

    tile_w = slab.shape[1]
    db_acc = jnp.zeros((C, tile_w), slab.dtype)
    dc_acc = jnp.zeros((C, tile_w), slab.dtype)
    dd_acc = jnp.zeros((C, tile_w), slab.dtype)
    for s in reversed(range(m)):
        base = s * dt_sub
        _ks, ys, h1s, gs, dxs = run_stages(zs[s], base, save=True)
        v = [None] * n_stages
        for stg in reversed(range(n_stages)):
            u = None
            if c_sol[stg] != 0.0:
                u = (dt_sub * c_sol[stg]) * lam
            for s2 in range(stg + 1, n_stages):
                coef = beta[s2 - 1][stg]
                if coef != 0.0:
                    term = (dt_sub * coef) * v[s2]
                    u = term if u is None else u + term
            if u is None:
                u = jnp.zeros_like(lam)
            fr = base + stage_times[stg] * dt_sub
            dy, dw1t, db1_, dw2t, db2_, ddx = _stage_backward(
                u, ys[stg], fr, h1s[stg], gs[stg], dxs[stg], w1t, w2t, rep,
                sel, C, H, mx
            )
            v[stg] = dy
            dw1_acc[:, :] += dw1t
            db1_acc[:, :] += db1_
            dw2_acc[:, :] += dw2t
            db2_acc[:, :] += db2_
            db_acc = db_acc + ddx
            dc_acc = dc_acc + fr * ddx
            dd_acc = dd_acc + (fr * fr) * ddx
        for stg in range(n_stages):
            lam = lam + v[stg]

    lam_scr[:, :] = lam
    dz0_ref[:, :] = lam
    # Coefficient cotangents accumulate in f32 registers above; the block
    # write casts to the coefficient storage dtype (bf16 for bf16 models).
    dct_ref[:, :] = jnp.concatenate(
        [db_acc, dc_acc, dd_acc,
         jnp.zeros((_SLAB - 3 * C, tile_w), slab.dtype)],
        axis=0).astype(dct_ref.dtype)
    dw1_ref[0] = dw1_acc[:, :]
    db1_ref[0] = db1_acc[:, :]
    dw2_ref[0] = dw2_acc[:, :]
    db2_ref[0] = db2_acc[:, :]


@functools.lru_cache(maxsize=64)
def _make_fused_solve(n, tile_fwd, n_tiles_fwd, tile_bwd, n_tiles_bwd, m,
                      dt_sub, tableau, C, H, W, CHp, interpret,
                      mx=jnp.float32, out_knots=(), ct_dtype=jnp.float32):
    """Builds the custom_vjp'd solve over kernel-layout operands.

    ``mx`` is the MXU operand dtype for the stage matmuls (bf16 for bf16
    models — matching the XLA path, whose bf16 dots also run the MXU in
    bf16; f32 accumulation and f32 carried state in both modes).
    ``ct_dtype`` is the coefficient-slab STORAGE dtype: bf16 models keep the
    slabs (and receive their cotangents) in bf16, halving the dominant HBM
    stream; the kernels upcast each slab block to f32 on load.

    Operands:
      ct2  (n*16, Bp) ct_dtype — per-interval [b; two_c; three_d; 0-pad] rows
      z0t  (Hp, Bp) f32
      w1t  (W, Hp), b1 (W, 1), w2t (CHp, W), b2 (CHp, 1) — f32
    Returns out (n_out*Hp, Bp) f32: the states at the REQUESTED knots
    ``out_knots`` (each >= 1; knot 0 is the caller's z0).  The full knot
    trajectory is an internal residual (saved fwd->bwd, never a cotangent
    carrier), so the backward's gz is n_out rows — for a train step reading
    only the terminal state that is one row, not the whole trajectory.

    Forward and backward run different batch-tile widths (the backward's
    live set per lane is larger); both products must equal Bp.
    """
    Hp = _round_up(H, 8)
    Bp = tile_fwd * n_tiles_fwd
    assert Bp == tile_bwd * n_tiles_bwd
    n_out = len(out_knots)

    def specs(tile):
        slab = pl.BlockSpec((_SLAB, tile), lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)
        slab_rev = pl.BlockSpec((_SLAB, tile), lambda i, jr: (n - 1 - jr, i),
                                memory_space=pltpu.VMEM)
        z = pl.BlockSpec((Hp, tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM)
        # Interval j = n-1-jr reads its ENTRY state: residual row j - 1,
        # clamped at the earliest interval (which uses z0 instead).
        z_rev_shift = pl.BlockSpec(
            (Hp, tile), lambda i, jr: (jnp.maximum(n - 2 - jr, 0), i),
            memory_space=pltpu.VMEM)
        z0 = pl.BlockSpec((Hp, tile), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
        outs = pl.BlockSpec((n_out * Hp, tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
        return slab, slab_rev, z, z_rev_shift, z0, outs

    slab_spec, _, z_spec, _, z0_spec, out_spec = specs(tile_fwd)
    _, slab_spec_rev, _, z_rev_shift, z0_spec_bwd, gz_spec = specs(tile_bwd)

    def rep_spec(shape):
        zero = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, j, _z=zero: _z,
                            memory_space=pltpu.VMEM)

    ct_bytes = 2 if ct_dtype == jnp.bfloat16 else 4
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, tableau=tableau, m=m, dt_sub=dt_sub,
                          C=C, H=H, out_knots=out_knots, mx=mx),
        out_shape=(
            jax.ShapeDtypeStruct((n_out * Hp, Bp), jnp.float32),  # requested
            jax.ShapeDtypeStruct((n * Hp, Bp), jnp.float32),      # residuals
        ),
        grid=(n_tiles_fwd, n),
        in_specs=[slab_spec, z0_spec, rep_spec((W, Hp)), rep_spec((W, 1)),
                  rep_spec((CHp, W)), rep_spec((CHp, 1))],
        out_specs=(out_spec, z_spec),
        scratch_shapes=[pltpu.VMEM((Hp, tile_fwd), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 4 * (H * W + W * C * H) * n * Bp,
            bytes_accessed=n * Bp * (ct_bytes * _SLAB + 4 * Hp)
            + 4 * n_out * Hp * Bp,
            transcendentals=m * 4 * n * Bp * C * H,
        ),
        interpret=interpret,
    )

    tile_out_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i, jr: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, tableau=tableau, m=m, dt_sub=dt_sub,
                          C=C, H=H, n=n, out_knots=out_knots, mx=mx),
        out_shape=(
            jax.ShapeDtypeStruct((n * _SLAB, Bp), ct_dtype),      # dct
            jax.ShapeDtypeStruct((Hp, Bp), jnp.float32),          # dz0
            jax.ShapeDtypeStruct((n_tiles_bwd, W, Hp), jnp.float32),  # dw1 parts
            jax.ShapeDtypeStruct((n_tiles_bwd, W, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_bwd, CHp, W), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_bwd, CHp, 1), jnp.float32),
        ),
        grid=(n_tiles_bwd, n),
        in_specs=[slab_spec_rev, z_rev_shift, z0_spec_bwd, gz_spec,
                  rep_spec((W, Hp)), rep_spec((W, 1)),
                  rep_spec((CHp, W)), rep_spec((CHp, 1))],
        out_specs=(slab_spec_rev, z0_spec_bwd,
                   tile_out_spec((W, Hp)), tile_out_spec((W, 1)),
                   tile_out_spec((CHp, W)), tile_out_spec((CHp, 1))),
        scratch_shapes=[
            pltpu.VMEM((Hp, tile_bwd), jnp.float32),
            pltpu.VMEM((W, Hp), jnp.float32),
            pltpu.VMEM((W, 1), jnp.float32),
            pltpu.VMEM((CHp, W), jnp.float32),
            pltpu.VMEM((CHp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * 4 * (H * W + W * C * H) * n * Bp,
            bytes_accessed=n * Bp * (2 * ct_bytes * _SLAB + 4 * Hp)
            + 4 * n_out * Hp * Bp,
            transcendentals=2 * m * 4 * n * Bp * C * H,
        ),
        interpret=interpret,
    )

    @jax.custom_vjp
    def solve(ct2, z0t, w1t, b1, w2t, b2):
        out, _zres = fwd_call(ct2, z0t, w1t, b1, w2t, b2)
        return out

    def solve_fwd(ct2, z0t, w1t, b1, w2t, b2):
        out, zres = fwd_call(ct2, z0t, w1t, b1, w2t, b2)
        return out, (ct2, z0t, w1t, b1, w2t, b2, zres)

    def solve_bwd(res, gz):
        ct2, z0t, w1t, b1, w2t, b2, zres = res
        dct, dz0, dw1p, db1p, dw2p, db2p = bwd_call(
            ct2, zres, z0t, gz, w1t, b1, w2t, b2
        )
        return (dct, dz0, jnp.sum(dw1p, axis=0), jnp.sum(db1p, axis=0),
                jnp.sum(dw2p, axis=0), jnp.sum(db2p, axis=0))

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


_TABLEAUS = {
    "euler": ((), (), (1.0,)),
    "midpoint": ((0.5,), ((0.5,),), (0.0, 1.0)),
    "heun": ((1.0,), ((1.0,),), (0.5, 0.5)),
    "rk4": ((0.5, 0.5, 1.0), ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
            (1 / 6, 1 / 3, 1 / 3, 1 / 6)),
}


def _kernel_mode():
    """Shared eligibility gate for every fused-kernel driver.

    Returns None (decline — forced off, non-TPU without force, or a
    multi-device mesh where GSPMD partitioning of a pallas_call is not part
    of the kernels' contract: sharded training takes the fully-partitionable
    XLA paths; explicit per-shard use via shard_map still works), or the
    ``interpret`` flag to build the kernels with.
    """
    if _FORCE is False or getattr(_TLS, "disable", 0):
        return None
    if not _on_tpu():
        return True if _FORCE is True else None
    if jax.device_count() > 1:
        return None
    return False


class _Packed:
    """Validated, kernel-layout operands shared by the fused drivers."""

    __slots__ = ("ct2", "z0t", "w1t", "b1c", "w2t", "b2c", "z0f", "batch",
                 "B", "Bp", "tile", "n_tiles", "tile_fwd", "n_tiles_fwd",
                 "C", "H", "W", "Hp", "CHp", "out_dtype", "mxu", "ct_dtype")


def _pack_operands(b_rows, c_rows, d_rows, z0, field, n, single_tile=None,
                   ct_store=None, linear=False):
    """Validate vector-field/batch shapes and pack the kernel operands.

    Returns a ``_Packed`` or None when ineligible.  ``single_tile``: a lane
    cap for kernels that keep the whole batch in one tile (the adaptive
    solver's whole-batch error norm); otherwise the batch is padded up to
    whole 1024-lane tiles.  ``ct_store="native"``: bf16 models keep the
    coefficient slab array (``ct2``) in bf16 — kernels built for it upcast
    slab blocks on load and emit bf16 slab cotangents; the default (None)
    upcasts everything to f32 for kernels without that handling.
    ``linear=True``: ``b_rows`` are LinearInterpolation slopes and
    c_rows/d_rows must be None — slabs hold only the C slope rows, so the
    channel cap is C <= _SLAB (16) instead of 3*C <= _SLAB, admitting the
    depth-3 log-ODE control (14 channels).
    """
    C = b_rows.shape[-1]
    H = field.hidden_channels
    w1, b1, w2, b2 = field.w1, field.b1, field.w2, field.b2
    W = w1.shape[-1]
    if w1.shape != (H, W) or w2.shape != (W, H * C) or field.input_channels != C:
        return None
    slab_rows = C if linear else 3 * C
    if W > MAX_WIDTH or C * H > MAX_CONTRACT or slab_rows > _SLAB:
        return None
    if linear:
        assert c_rows is None and d_rows is None
        arrays = (b_rows, z0, w1, b1, w2, b2)
    else:
        arrays = (b_rows, c_rows, d_rows, z0, w1, b1, w2, b2)
    # Same dtype policy as the streaming kernels (ops/pallas_dispatch.py):
    # f32 and bf16 are eligible.  bf16 operands are stored f32 in VMEM — the
    # solve's carried state and gradient accumulators need f32 — but the
    # stage matmuls feed the MXU in bf16 (p.mxu), matching the XLA path's
    # dot semantics for bf16 models at the MXU's native rate; results and
    # cotangents come back bf16.  The casts live in this differentiable
    # packing, so bf16 weight / coefficient cotangents fall out of autodiff
    # (a cast's transpose is the cast back).  Mixed dtypes decline: the XLA
    # path's promotion semantics are the contract there.
    if any(a.dtype != arrays[0].dtype for a in arrays):
        return None
    ct_dtype = jnp.float32
    if arrays[0].dtype == jnp.bfloat16:
        out_dtype = mxu = jnp.bfloat16
        if ct_store == "native":
            # Slab rows stay bf16 (the HBM-dominant stream); carried-state
            # operands still upcast — the solve's state and accumulators
            # are f32 either way.
            z0, w1, b1, w2, b2 = (a.astype(jnp.float32) for a in arrays[-5:])
            ct_dtype = jnp.bfloat16
        elif linear:
            b_rows, z0, w1, b1, w2, b2 = (
                a.astype(jnp.float32) for a in arrays)
        else:
            b_rows, c_rows, d_rows, z0, w1, b1, w2, b2 = (
                a.astype(jnp.float32) for a in arrays)
    elif arrays[0].dtype == jnp.float32:
        out_dtype = mxu = jnp.float32
    else:
        return None
    batch = jnp.broadcast_shapes(b_rows.shape[:-2], z0.shape[:-1])
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1

    p = _Packed()
    p.out_dtype = out_dtype
    p.mxu = mxu
    p.ct_dtype = ct_dtype
    p.batch, p.B, p.C, p.H, p.W = batch, B, C, H, W
    p.Hp = _round_up(H, 8)
    p.CHp = _round_up(C * H, 8)
    Bp = _round_up(max(B, 1), _LANES)
    if single_tile is not None:
        if Bp > single_tile:
            return None
        p.tile, p.n_tiles = Bp, 1
        p.tile_fwd, p.n_tiles_fwd = Bp, 1
    else:
        # The backward tile (holding all stage activations) caps the padding
        # granularity; the forward runs the widest tile that still divides
        # the padded batch (see MAX_TILE_FWD/BWD).
        p.tile = min(MAX_TILE_BWD, Bp)
        Bp = _round_up(Bp, p.tile)  # tile * n_tiles must cover the batch
        p.n_tiles = Bp // p.tile
        p.tile_fwd = MAX_TILE_FWD if Bp % MAX_TILE_FWD == 0 else p.tile
        p.n_tiles_fwd = Bp // p.tile_fwd
    p.Bp = Bp

    def flat_rows(r):
        return jnp.broadcast_to(r, batch + r.shape[-2:]).reshape(B, n, C)

    # Kernel-layout packing (plain XLA, hence differentiable — the custom_vjp
    # wraps only the Pallas calls, so gradients through this packing are
    # handled by autodiff).
    if linear:
        ct = jnp.concatenate(
            [flat_rows(b_rows),
             jnp.zeros((B, n, _SLAB - C), ct_dtype)], axis=-1)
    else:
        ct = jnp.concatenate(
            [flat_rows(b_rows), flat_rows(c_rows), flat_rows(d_rows),
             jnp.zeros((B, n, _SLAB - 3 * C), ct_dtype)], axis=-1)
    ct2 = jnp.transpose(ct, (1, 2, 0)).reshape(n * _SLAB, B)
    p.ct2 = jnp.pad(ct2, ((0, 0), (0, Bp - B)))

    p.z0f = jnp.broadcast_to(z0, batch + z0.shape[-1:]).reshape(B, H)
    p.z0t = jnp.pad(p.z0f.T, ((0, p.Hp - H), (0, Bp - B)))

    p.w1t = jnp.pad(w1.T, ((0, 0), (0, p.Hp - H)))  # (W, Hp)
    p.b1c = b1.reshape(W, 1)
    # Permute vector-field columns from the model's (h, i) = h*C + i flat
    # order to the kernel's i*H + h order, transpose, pad rows to CHp.
    w2p = w2.reshape(W, H, C).transpose(0, 2, 1).reshape(W, C * H)
    p.w2t = jnp.pad(w2p.T, ((0, p.CHp - C * H), (0, 0)))  # (CHp, W)
    b2p = b2.reshape(H, C).T.reshape(C * H, 1)
    p.b2c = jnp.pad(b2p, ((0, p.CHp - C * H), (0, 0)))
    return p


def try_fused_mlp_pallas(rows, z0, field, method, m, dt_sub, n,
                         out_knots=None):
    """Attempt the fused Pallas solve.

    rows: (b, two_c, three_d) spline rows, each (..., n, C); z0 (..., H);
    field: an MLPVectorField; m substeps of size dt_sub per interval (uniform
    knot spacing); out_knots: strictly-increasing knot indices in [0, n] to
    return (None = all knots).  Returns the states at ``out_knots``,
    time-leading, or None when not applicable.  Only the requested knots
    cross the custom_vjp boundary — the trajectory is an internal residual —
    so a terminal-state loss backpropagates one cotangent row, not n.
    """
    interpret = _kernel_mode()
    if interpret is None:
        return None
    if method not in _TABLEAUS or m > MAX_SUBSTEPS:
        return None
    if out_knots is None:
        out_knots = tuple(range(n + 1))
    else:
        out_knots = tuple(int(k) for k in out_knots)
    kernel_knots = tuple(k for k in out_knots if k > 0)
    if not kernel_knots:
        return None
    p = _pack_operands(*rows, z0, field, n, ct_store="native")
    if p is None:
        return None

    # The requested-knot block stays VMEM-resident per batch tile; shrink the
    # forward tile (or decline) rather than oversubscribe VMEM when a caller
    # asks for very many knots of a very long control.
    out_block_limit = 6 * 1024 * 1024
    tile_fwd, n_tiles_fwd = p.tile_fwd, p.n_tiles_fwd
    if len(kernel_knots) * p.Hp * tile_fwd * 4 > out_block_limit:
        tile_fwd, n_tiles_fwd = p.tile, p.n_tiles
    if len(kernel_knots) * p.Hp * p.tile * 4 > out_block_limit:
        return None

    solve = _make_fused_solve(n, tile_fwd, n_tiles_fwd, p.tile, p.n_tiles,
                              m, float(dt_sub), _TABLEAUS[method], p.C, p.H,
                              p.W, p.CHp, interpret, p.mxu, kernel_knots,
                              p.ct_dtype)
    outk = solve(p.ct2, p.z0t, p.w1t, p.b1c, p.w2t, p.b2c)

    sel = outk.reshape(len(kernel_knots), p.Hp, p.Bp)[:, :p.H, :p.B]
    sel = jnp.moveaxis(sel, 1, -1).reshape(
        (len(kernel_knots),) + p.batch + (p.H,))
    if 0 in out_knots:  # knot 0 is z0 itself — assembled here, not in-kernel
        z0b = jnp.broadcast_to(p.z0f.reshape(p.batch + (p.H,)),
                               p.batch + (p.H,))
        out = jnp.concatenate([z0b[None], sel], axis=0)
    else:
        out = sel
    return out.astype(p.out_dtype)


# ---------------------------------------------------------------------------
# Reversible Heun (the torchsde-backend capability, reference README.md:105)
# as the same fused-kernel design: forward carries (y, yhat) across the
# interval grid; backward walks the grid in reverse, reconstructing states
# with the algebraically-exact inverse map (O(1) residual memory beyond the
# per-knot outputs) and accumulating the per-step VJPs — the math of
# solvers/reversible_adjoint.py with zero per-stage dispatch.
# ---------------------------------------------------------------------------


def _rev_fwd_kernel(ct_ref, z0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    y_ref, yhat_ref, y_scr, yhat_scr, *, m, dt_sub, C, H, g):
    """Processes ``g`` consecutive intervals per grid step: one interval per
    step leaves the kernel Mosaic-overhead-bound (measured 4.3 us/grid step
    vs ~1.5 us of attainable thin-K compute at tile 4096), so consecutive
    intervals stream as one slab block and amortise the fixed cost."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        y_scr[:, :] = z0_ref[:, :]
        yhat_scr[:, :] = z0_ref[:, :]

    CHp = w2_ref.shape[0]
    Hp = z0_ref.shape[0]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]
    y, yhat = y_scr[:, :], yhat_scr[:, :]

    for q in range(g):
        slab = ct_ref[q * _SLAB:(q + 1) * _SLAB, :]
        # dX/dt is discontinuous at knots: re-evaluate at the new interval's
        # local fraction 0 rather than carrying fhat across the knot.
        fhat, _h, _g_, _dx = _stage_forward(yhat, 0.0, slab, w1t, b1, w2t,
                                            b2, rep, sel, C, H)
        for s in range(m):
            yhat1 = 2.0 * y - yhat + dt_sub * fhat
            fhat1, _h, _g_, _dx = _stage_forward(
                yhat1, (s + 1) * dt_sub, slab, w1t, b1, w2t, b2, rep, sel,
                C, H)
            y = y + (0.5 * dt_sub) * (fhat + fhat1)
            yhat, fhat = yhat1, fhat1
        y_ref[q * Hp:(q + 1) * Hp, :] = y
        yhat_ref[q * Hp:(q + 1) * Hp, :] = yhat

    y_scr[:, :] = y
    yhat_scr[:, :] = yhat


def _rev_bwd_kernel(ct_ref, yk_ref, yhk_ref, gz_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    dct_ref, dz0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    ay_scr, ayh_scr, dw1_acc, db1_acc, dw2_acc, db2_acc,
                    *, m, dt_sub, C, H, g):
    jr = pl.program_id(1)

    @pl.when(jr == 0)
    def _():
        ay_scr[:, :] = jnp.zeros_like(ay_scr)
        ayh_scr[:, :] = jnp.zeros_like(ayh_scr)
        dw1_acc[:, :] = jnp.zeros_like(dw1_acc)
        db1_acc[:, :] = jnp.zeros_like(db1_acc)
        dw2_acc[:, :] = jnp.zeros_like(dw2_acc)
        db2_acc[:, :] = jnp.zeros_like(db2_acc)

    CHp = w2_ref.shape[0]
    Hp = dz0_ref.shape[0]
    rep = sel = None
    if H % 8:
        rep, sel = _selection_matrices(C, H, CHp, jnp.float32)
    w1t, b1 = w1_ref[:, :], b1_ref[:, :]
    w2t, b2 = w2_ref[:, :], b2_ref[:, :]

    ay = ay_scr[:, :]
    ayh = ayh_scr[:, :]
    tile_w = ct_ref.shape[1]

    # Blocks hold g consecutive intervals (row q of the block <-> interval
    # group_start+q); the block sequence is reversed by the index map and
    # the in-block walk below is reversed too -> a full reverse sweep.
    for q in reversed(range(g)):
        slab = ct_ref[q * _SLAB:(q + 1) * _SLAB, :]
        # knot q+1's output cotangent enters when its interval's VJP starts
        ay = ay + gz_ref[q * Hp:(q + 1) * Hp, :]
        y1 = yk_ref[q * Hp:(q + 1) * Hp, :]
        yhat1 = yhk_ref[q * Hp:(q + 1) * Hp, :]

        db_acc = jnp.zeros((C, tile_w), slab.dtype)
        dc_acc = jnp.zeros((C, tile_w), slab.dtype)
        dd_acc = jnp.zeros((C, tile_w), slab.dtype)

        for s in reversed(range(m)):
            fr1 = (s + 1) * dt_sub
            fr0 = s * dt_sub
            # Exact inverse map reconstructs the step's inputs; the two
            # stage evaluations double as the recompute for the step's VJP.
            f1, h11, g1, dx1 = _stage_forward(yhat1, fr1, slab, w1t, b1,
                                              w2t, b2, rep, sel, C, H)
            yhat0 = 2.0 * y1 - yhat1 - dt_sub * f1
            f0, h10, g0, dx0 = _stage_forward(yhat0, fr0, slab, w1t, b1,
                                              w2t, b2, rep, sel, C, H)
            y0 = y1 - (0.5 * dt_sub) * (f1 + f0)

            # VJP of: yhat1 = 2 y0 - yhat0 + dt f(yhat0); y1 = y0 + dt/2 (f(yhat0) + f(yhat1)).
            u1 = (0.5 * dt_sub) * ay
            v1, dw1t, db1_, dw2t, db2_, ddx1 = _stage_backward(
                u1, yhat1, fr1, h11, g1, dx1, w1t, w2t, rep, sel, C, H)
            dw1_acc[:, :] += dw1t
            db1_acc[:, :] += db1_
            dw2_acc[:, :] += dw2t
            db2_acc[:, :] += db2_
            db_acc, dc_acc, dd_acc = (db_acc + ddx1, dc_acc + fr1 * ddx1,
                                      dd_acc + (fr1 * fr1) * ddx1)
            ayh1 = ayh + v1
            u0 = (0.5 * dt_sub) * ay + dt_sub * ayh1
            v0, dw1t, db1_, dw2t, db2_, ddx0 = _stage_backward(
                u0, yhat0, fr0, h10, g0, dx0, w1t, w2t, rep, sel, C, H)
            dw1_acc[:, :] += dw1t
            db1_acc[:, :] += db1_
            dw2_acc[:, :] += dw2t
            db2_acc[:, :] += db2_
            db_acc, dc_acc, dd_acc = (db_acc + ddx0, dc_acc + fr0 * ddx0,
                                      dd_acc + (fr0 * fr0) * ddx0)
            ay = ay + 2.0 * ayh1
            ayh = -ayh1 + v0
            y1, yhat1 = y0, yhat0

        dct_ref[q * _SLAB:(q + 1) * _SLAB, :] = jnp.concatenate(
            [db_acc, dc_acc, dd_acc,
             jnp.zeros((_SLAB - 3 * C, tile_w), slab.dtype)], axis=0)

    ay_scr[:, :] = ay
    ayh_scr[:, :] = ayh
    # After the earliest interval, y_0 = yhat_0 = z0: both adjoints flow there.
    dz0_ref[:, :] = ay + ayh
    dw1_ref[0] = dw1_acc[:, :]
    db1_ref[0] = db1_acc[:, :]
    dw2_ref[0] = dw2_acc[:, :]
    db2_ref[0] = db2_acc[:, :]


@functools.lru_cache(maxsize=64)
def _make_fused_rev_solve(n, tile, n_tiles, m, dt_sub, C, H, W, CHp, interpret):
    """Reversible-Heun analogue of _make_fused_solve; same operand layouts.
    Returns y at knots 1..n (yhat is an internal residual)."""
    Hp = _round_up(H, 8)
    Bp = tile * n_tiles
    # One interval per grid step is Mosaic-overhead-bound (measured ~4.3 us
    # per grid step vs ~1.5 us of attainable thin-K compute at tile 4096):
    # stream g consecutive intervals per grid step.  g must divide n (the
    # block index maps below address whole groups); cap the unroll at
    # 16 interval-substeps per kernel body.
    g = 1
    for cand in range(min(n, max(1, 16 // max(m, 1))), 0, -1):
        if n % cand == 0:
            g = cand
            break
    n_groups = n // g
    grid = (n_tiles, n_groups)

    slab_spec = pl.BlockSpec((g * _SLAB, tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM)
    slab_spec_rev = pl.BlockSpec((g * _SLAB, tile),
                                 lambda i, jr: (n_groups - 1 - jr, i),
                                 memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((g * Hp, tile), lambda i, j: (j, i),
                          memory_space=pltpu.VMEM)
    z_spec_rev = pl.BlockSpec((g * Hp, tile),
                              lambda i, jr: (n_groups - 1 - jr, i),
                              memory_space=pltpu.VMEM)
    z0_spec = pl.BlockSpec((Hp, tile), lambda i, j: (0, i),
                           memory_space=pltpu.VMEM)

    def rep_spec(shape):
        zero = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, j, _z=zero: _z,
                            memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_rev_fwd_kernel, m=m, dt_sub=dt_sub, C=C, H=H, g=g),
        out_shape=(jax.ShapeDtypeStruct((n * Hp, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((n * Hp, Bp), jnp.float32)),
        grid=grid,
        in_specs=[slab_spec, z0_spec, rep_spec((W, Hp)), rep_spec((W, 1)),
                  rep_spec((CHp, W)), rep_spec((CHp, 1))],
        out_specs=(z_spec, z_spec),
        scratch_shapes=[pltpu.VMEM((Hp, tile), jnp.float32),
                        pltpu.VMEM((Hp, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (m + 1) * (H * W + W * C * H) * n * Bp,
            bytes_accessed=4 * n * Bp * (_SLAB + 3 * Hp),
            transcendentals=(m + 1) * n * Bp * C * H,
        ),
        interpret=interpret,
    )

    tile_out_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i, jr: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    bwd_call = pl.pallas_call(
        functools.partial(_rev_bwd_kernel, m=m, dt_sub=dt_sub, C=C, H=H, g=g),
        out_shape=(
            jax.ShapeDtypeStruct((n * _SLAB, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, W, Hp), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, W, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, CHp, W), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, CHp, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[slab_spec_rev, z_spec_rev, z_spec_rev, z_spec_rev,
                  rep_spec((W, Hp)), rep_spec((W, 1)),
                  rep_spec((CHp, W)), rep_spec((CHp, 1))],
        out_specs=(slab_spec_rev, z0_spec,
                   tile_out_spec((W, Hp)), tile_out_spec((W, 1)),
                   tile_out_spec((CHp, W)), tile_out_spec((CHp, 1))),
        scratch_shapes=[
            pltpu.VMEM((Hp, tile), jnp.float32),
            pltpu.VMEM((Hp, tile), jnp.float32),
            pltpu.VMEM((W, Hp), jnp.float32),
            pltpu.VMEM((W, 1), jnp.float32),
            pltpu.VMEM((CHp, W), jnp.float32),
            pltpu.VMEM((CHp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * m * (H * W + W * C * H) * n * Bp,
            bytes_accessed=4 * n * Bp * (2 * _SLAB + 4 * Hp),
            transcendentals=2 * m * n * Bp * C * H,
        ),
        interpret=interpret,
    )

    @jax.custom_vjp
    def solve(ct2, z0t, w1t, b1, w2t, b2):
        y, _yhat = fwd_call(ct2, z0t, w1t, b1, w2t, b2)
        return y

    def solve_fwd(ct2, z0t, w1t, b1, w2t, b2):
        y, yhat = fwd_call(ct2, z0t, w1t, b1, w2t, b2)
        return y, (ct2, z0t, w1t, b1, w2t, b2, y, yhat)

    def solve_bwd(res, gz):
        ct2, z0t, w1t, b1, w2t, b2, y, yhat = res
        dct, dz0, dw1p, db1p, dw2p, db2p = bwd_call(
            ct2, y, yhat, gz, w1t, b1, w2t, b2
        )
        return (dct, dz0, jnp.sum(dw1p, axis=0), jnp.sum(db1p, axis=0),
                jnp.sum(dw2p, axis=0), jnp.sum(db2p, axis=0))

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def try_fused_reversible_heun(X, func, z0, ts, step_size):
    """Fused-kernel reversible-Heun solve with its exact O(1)-memory adjoint.

    Same applicability rules as try_fused_mlp_pallas (cubic control, uniform
    knot spacing, dividing step, MLP field, f32 or bf16, single device).
    Returns the time-leading solution at ``ts`` or None.
    """
    from .fused_fixed import plan_fixed_grid
    from .terms import MLPVectorField

    if not isinstance(func, MLPVectorField) or isinstance(z0, (tuple, list)):
        return None
    plan = plan_fixed_grid(X, ts, step_size)
    if plan is None or not plan[-1]:  # uniform spacing required
        return None
    rows, _grid, out_idx, j0, jN, m, dt_sub, _uniform = plan

    interpret = _kernel_mode()
    if interpret is None:
        return None
    if m > MAX_SUBSTEPS:
        return None

    b_rows, c_rows, d_rows = (r[..., j0:jN, :] for r in rows[1:])
    n = jN - j0
    p = _pack_operands(b_rows, c_rows, d_rows, z0, func, n)
    if p is None:
        return None

    solve = _make_fused_rev_solve(n, p.tile, p.n_tiles, m, float(dt_sub),
                                  p.C, p.H, p.W, p.CHp, interpret)
    zout = solve(p.ct2, p.z0t, p.w1t, p.b1c, p.w2t, p.b2c)
    knots = zout.reshape(n, p.Hp, p.Bp)[:, :p.H, :p.B]
    knots = jnp.moveaxis(knots, 1, -1).reshape((n,) + p.batch + (p.H,))
    z0b = jnp.broadcast_to(p.z0f.reshape(p.batch + (p.H,)), p.batch + (p.H,))
    all_knots = jnp.concatenate([z0b[None], knots], axis=0).astype(p.out_dtype)
    return jnp.take(all_knots, jnp.asarray(out_idx - j0), axis=0)
