"""Tests for the fused adaptive dopri5 Pallas kernel (fused_dopri_pallas.py).

Interpreter mode on CPU.  Because two floating-point implementations of the
same PI controller realise slightly different step meshes (accumulation-order
rounding flips accept/reject decisions), exact equivalence with the XLA path
is only defined per-mesh: the decisive backward test replays the kernel's own
realised mesh as a differentiable XLA computation and demands exact gradient
agreement; the cross-path tests bound the difference by solution accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu
from torchcde_tpu.interpolation.cubic import CubicSpline
from torchcde_tpu.solvers import fused_dopri_pallas as fdp
from torchcde_tpu.solvers import fused_pallas
from torchcde_tpu.solvers.integrate import select_initial_step
from torchcde_tpu.solvers.runge_kutta import DOPRI5, _solve_dense_midpoint
from torchcde_tpu.solvers.terms import MLPVectorField, make_cde_rhs

# Interpret-mode Pallas kernels are ~100x slower than compiled; this module
# is part of the slow tier (run the fast core suite with -m 'not slow').
pytestmark = pytest.mark.slow


@pytest.fixture
def forced_interpret():
    fused_pallas.force_fused_pallas(True)
    yield
    fused_pallas.force_fused_pallas(None)


def _setup(B, L, C, H, W, seed=0, scale=0.2):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((B, L, C)).astype(np.float32))
    w1 = jnp.asarray(r.standard_normal((H, W)) * scale, jnp.float32)
    b1 = jnp.asarray(r.standard_normal((W,)) * scale, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((W, H * C)) * scale, jnp.float32)
    b2 = jnp.asarray(r.standard_normal((H * C,)) * scale, jnp.float32)
    z0 = jnp.asarray(r.standard_normal((B, H)).astype(np.float32))
    return (x, z0, w1, b1, w2, b2)


def _loss_fn(C, H, t, rtol, atol, adjoint=False):
    def loss(args, force):
        x_, z0_, w1_, b1_, w2_, b2_ = args
        co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x_)
        fused_pallas.force_fused_pallas(force)
        try:
            X = CubicSpline(co)
            fl = MLPVectorField(w1_, b1_, w2_, b2_, H, C)
            out = torchcde_tpu.cdeint(X=X, func=fl, z0=z0_, t=t,
                                      adjoint=adjoint, method="dopri5",
                                      rtol=rtol, atol=atol)
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out)), out

    return loss


@pytest.mark.parametrize("H", [3, 8])  # H=8: matrix-free VPU selection path
def test_gradients_match_differentiable_replay_of_realised_mesh(
        forced_interpret, H):
    """THE backward-correctness test: extract the kernel's accepted (t, dt)
    mesh, replay those exact steps (and the dense-output quartic) as plain
    differentiable jnp, and require exact gradient agreement."""
    B, L, C, W = 3, 6, 2, 8
    args = _setup(B, L, C, H, W, seed=1, scale=0.08)
    x, z0, w1, b1, w2, b2 = args
    ts = np.asarray([0.0, 5.0])
    rtol, atol = 1e-5, 1e-7

    loss = _loss_fn(C, H, jnp.asarray(ts, jnp.float32), rtol, atol)
    (l_f, out_f), g_f = jax.value_and_grad(loss, has_aux=True)(args, True)

    # Reach into the kernel for the realised mesh.
    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    X = CubicSpline(co)
    grid = X.grid_points
    n = grid.shape[0] - 1
    Hp = fdp._round_up(H, 8)
    CHp = fdp._round_up(C * H, 8)
    Bp = 128
    rows = (X._b, X._two_c, X._three_d)
    ct = jnp.concatenate(
        [*rows, jnp.zeros((B, n, fdp._SLAB - 3 * C), jnp.float32)], axis=-1)
    ct2 = jnp.pad(jnp.transpose(ct, (1, 2, 0)).reshape(n * fdp._SLAB, B),
                  ((0, 0), (0, Bp - B)))
    z0t = jnp.pad(z0.T, ((0, Hp - H), (0, Bp - B)))
    w1t = jnp.pad(w1.T, ((0, 0), (0, Hp - H)))
    w2p = w2.reshape(W, H, C).transpose(0, 2, 1).reshape(W, C * H)
    w2t = jnp.pad(w2p.T, ((0, CHp - C * H), (0, 0)))
    b2c = jnp.pad(b2.reshape(H, C).T.reshape(C * H, 1),
                  ((0, CHp - C * H), (0, 0)))
    fl = MLPVectorField(w1, b1, w2, b2, H, C)
    rhs = make_cde_rhs(fl, X)
    f0 = rhs(jnp.float32(0.0), z0)
    dt0 = select_initial_step(rhs, jnp.float32(0.0), z0, 5, rtol, atol, f0)
    dt0 = jax.lax.stop_gradient(dt0).astype(jnp.float32).reshape(1, 1)
    solve = fdp._make_fused_dopri(
        n, Bp, (float(ts[1]),), float(ts[0]), float(ts[1]), float(grid[0]),
        float(np.diff(grid)[0]), rtol, atol, 4096, 2048, C, H, W, CHp, B,
        0.9, 10.0, 0.2, True)
    _z, _zfin, _dtfin, _zs, tst, dtst, cnt = solve._fwd_call(
        ct2, z0t, w1t, b1.reshape(W, 1), w2t, b2c, dt0)
    cnt = int(cnt[0, 0])
    t_arr = np.asarray(tst)[:cnt, 0].astype(np.float64)
    dt_arr = np.asarray(dtst)[:cnt, 0].astype(np.float64)
    assert cnt > 3
    bmid = _solve_dense_midpoint(DOPRI5)

    def replay_loss(args):
        x_, z0_, w1_, b1_, w2_, b2_ = args
        co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x_)
        Xl = CubicSpline(co)
        b_r, c_r, d_r = Xl._b, Xl._two_c, Xl._three_d

        def f(tval, z):
            j = int(np.clip(np.floor(tval), 0, n - 1))
            fr = jnp.float32(tval - j)
            dx = b_r[:, j] + (c_r[:, j] + d_r[:, j] * fr) * fr
            h = jnp.maximum(z @ w1_ + b1_, 0)
            g = jnp.tanh(h @ w2_ + b2_)
            return jnp.sum(g.reshape(B, H, C) * dx[:, None, :], axis=-1)

        z = z0_
        emitted = None
        for s in range(cnt):
            t0s, dts = float(t_arr[s]), float(dt_arr[s])
            ks = [f(t0s, z)]
            for a_i, brow in zip(DOPRI5.alpha, DOPRI5.beta):
                y = z
                for q, coef in enumerate(brow):
                    if coef != 0.0:
                        y = y + (dts * coef) * ks[q]
                ks.append(f(t0s + a_i * dts, y))
            z1 = z
            for q, coef in enumerate(DOPRI5.c_sol):
                if coef != 0.0:
                    z1 = z1 + (dts * coef) * ks[q]
            y_mid = z
            for q, coef in enumerate(bmid):
                if coef != 0.0:
                    y_mid = y_mid + (dts * coef) * ks[q]
            tk = float(ts[1])
            if (tk > t0s) and (tk <= t0s + dts):
                theta = (tk - t0s) / dts
                m = fdp._MINV
                p2, p3, p4 = theta**2, theta**3, theta**4
                cA = p2 * m[2][0] + p3 * m[1][0] + p4 * m[0][0]
                cB = p2 * m[2][1] + p3 * m[1][1] + p4 * m[0][1]
                cC = p2 * m[2][2] + p3 * m[1][2] + p4 * m[0][2]
                rA = z1 - z - dts * ks[0]
                rB = dts * (ks[-1] - ks[0])
                rC = y_mid - z - 0.5 * dts * ks[0]
                emitted = z + theta * dts * ks[0] + cA * rA + cB * rB + cC * rC
            z = z1
        out = jnp.stack([z0_, emitted], axis=0)
        return jnp.sum(jnp.sin(out)), out

    (l_r, out_r), g_r = jax.value_and_grad(replay_loss, has_aux=True)(args)
    assert jnp.allclose(l_f, l_r, rtol=1e-5, atol=1e-6)
    assert jnp.allclose(out_f, jnp.moveaxis(out_r, 0, -2), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_f)):
        assert jnp.allclose(a, b, rtol=1e-4, atol=1e-5)


def test_forward_matches_general_path_within_solution_accuracy(forced_interpret):
    """Different f32 accumulation orders realise slightly different meshes;
    both solutions must agree to within the requested accuracy."""
    B, L, C, H, W = 4, 7, 3, 4, 16
    args = _setup(B, L, C, H, W, seed=0, scale=0.2)
    t = jnp.asarray([0.0, 1.7, 3.2, 6.0], jnp.float32)
    loss = _loss_fn(C, H, t, 1e-6, 1e-8)
    (_, out_ref), _ = jax.value_and_grad(loss, has_aux=True)(args, False)
    (_, out_fp), _ = jax.value_and_grad(loss, has_aux=True)(args, True)
    assert out_fp.shape == out_ref.shape
    assert jnp.max(jnp.abs(out_ref - out_fp)) < 1e-3
    assert bool(jnp.all(jnp.isfinite(out_fp)))


def test_adjoint_routes_and_is_finite(forced_interpret):
    B, L, C, H, W = 3, 6, 2, 3, 8
    args = _setup(B, L, C, H, W, seed=4, scale=0.08)
    t = jnp.asarray([0.0, 5.0], jnp.float32)
    loss = _loss_fn(C, H, t, 1e-5, 1e-7, adjoint=True)
    (l, out), g = jax.value_and_grad(loss, has_aux=True)(args, True)
    assert bool(jnp.isfinite(l))
    assert all(bool(jnp.all(jnp.isfinite(le))) for le in jax.tree_util.tree_leaves(g))
    # and tracks the direct-mode fused gradients tightly (same kernel).
    loss_d = _loss_fn(C, H, t, 1e-5, 1e-7, adjoint=False)
    (_, _), g_d = jax.value_and_grad(loss_d, has_aux=True)(args, True)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_d)):
        assert jnp.allclose(a, b, rtol=1e-6, atol=1e-7)


def test_declines_out_of_caps(forced_interpret):
    """Non-uniform grids decline to the XLA path."""
    B, L, C, H, W = 2, 5, 2, 3, 8
    args = _setup(B, L, C, H, W, seed=5, scale=0.1)
    x, z0, w1, b1, w2, b2 = args
    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    t_knots = jnp.asarray([0.0, 1.0, 2.5, 3.0, 4.0], jnp.float32)
    X = CubicSpline(co, t_knots)
    field = MLPVectorField(w1, b1, w2, b2, H, C)
    out = torchcde_tpu.cdeint(X=X, func=field, z0=z0, t=X.interval,
                              adjoint=False, method="dopri5")
    assert out.shape == (B, 2, H)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_grouped_batch_matches_xla_path(forced_interpret, monkeypatch):
    """Batches beyond MAX_TILE split into independent per-group solves with
    their own controllers (module docstring): the grouped solve must route
    fused, cover the ragged tail, and agree with the XLA whole-batch-norm
    solve to solution accuracy."""
    monkeypatch.setattr(fdp, "MAX_TILE", 128)
    C, H, W = 2, 3, 8
    B = 3 * 128 - 40  # three groups, ragged tail
    args = _setup(B, 6, C, H, W, seed=7, scale=0.08)
    x, z0, w1, b1, w2, b2 = args
    t = np.asarray([0.0, 2.0, 5.0])
    field = MLPVectorField(w1, b1, w2, b2, H, C)

    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    X = CubicSpline(co)
    from torchcde_tpu.solvers.integrate import SolverConfig

    cfg = SolverConfig(method="dopri5", rtol=1e-6, atol=1e-8)
    out = fdp.try_fused_dopri5(X, field, z0, t, cfg)
    assert out is not None and out.shape == (3, B, H)

    fused_pallas.force_fused_pallas(False)
    try:
        ref = torchcde_tpu.cdeint(X=X, func=field, z0=z0, t=t, adjoint=False,
                                  method="dopri5", rtol=1e-6, atol=1e-8)
    finally:
        fused_pallas.force_fused_pallas(True)
    ref = jnp.moveaxis(ref, -2, 0)
    assert jnp.max(jnp.abs(out - ref)) < 5e-3


def test_chunked_intervals_match_xla_path(forced_interpret, monkeypatch):
    """Coefficient tables beyond MAX_INTERVALS stream as carried chunks; the
    chunked solve must agree with the XLA path to solution accuracy and its
    gradients must track the XLA path's (same frozen-mesh semantics)."""
    monkeypatch.setattr(fdp, "MAX_INTERVALS", 4)
    B, L, C, H, W = 3, 14, 2, 3, 8  # n = 13 intervals -> 4 chunks
    args = _setup(B, L, C, H, W, seed=9, scale=0.08)
    t = jnp.asarray([0.0, 3.3, 9.0, 13.0], jnp.float32)
    loss = _loss_fn(C, H, t, 1e-6, 1e-8)
    (l_ref, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(args, False)
    (l_fp, out_fp), g_fp = jax.value_and_grad(loss, has_aux=True)(args, True)
    assert out_fp.shape == out_ref.shape
    assert jnp.max(jnp.abs(out_ref - out_fp)) < 1e-3
    assert bool(jnp.all(jnp.isfinite(out_fp)))
    # Gradient agreement: both are frozen-mesh gradients of meshes realising
    # the same tight tolerance; they agree to a few parts in a thousand.
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fp)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2

    # Chunked adjoint=True routes the same kernel: exactly equal gradients.
    loss_adj = _loss_fn(C, H, t, 1e-6, 1e-8, adjoint=True)
    (_, _), g_adj = jax.value_and_grad(loss_adj, has_aux=True)(args, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_adj),
                    jax.tree_util.tree_leaves(g_fp)):
        assert jnp.allclose(a, b, rtol=1e-6, atol=1e-7)


def test_multi_dim_batch_initial_step(forced_interpret):
    # Regression: the Hairer initial-step probe ran on the batch-FLATTENED
    # state while X kept its (2, 3) batch dims — a trace-time crash on any
    # multi-dim-batch default-config solve.
    C, H, W = 2, 3, 8
    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((2, 3, 6, C)).astype(np.float32))
    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    w1 = jnp.asarray(r.standard_normal((H, W)) * 0.2, jnp.float32)
    b1 = jnp.asarray(r.standard_normal((W,)) * 0.2, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((W, H * C)) * 0.2, jnp.float32)
    b2 = jnp.asarray(r.standard_normal((H * C,)) * 0.2, jnp.float32)
    z0 = jnp.asarray(r.standard_normal((2, 3, H)).astype(np.float32))
    t = np.asarray([0.0, 5.0])

    def run(force):
        fused_pallas.force_fused_pallas(force)
        try:
            X = CubicSpline(co)
            fl = MLPVectorField(w1, b1, w2, b2, H, C)
            return torchcde_tpu.cdeint(X=X, func=fl, z0=z0, t=t,
                                       adjoint=False, method="dopri5",
                                       rtol=1e-3, atol=1e-5)
        finally:
            fused_pallas.force_fused_pallas(None)

    out = run(True)
    ref = run(False)
    assert out.shape == (2, 3, 2, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_declines_explicit_max_steps_beyond_store(forced_interpret):
    # A caller explicitly asking for a step budget larger than the
    # trajectory store must get the XLA path (which honors it), not a
    # silently truncated kernel budget.
    from torchcde_tpu.solvers.fused_dopri_pallas import _STORE_CAP, try_fused_dopri5
    from torchcde_tpu.solvers.integrate import SolverConfig

    C, H, W = 2, 3, 8
    args = _setup(2, 6, C, H, W)
    x, z0 = args[0], args[1]
    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    X = CubicSpline(co)
    fl = MLPVectorField(args[2], args[3], args[4], args[5], H, C)
    cfg = SolverConfig(method="dopri5", rtol=1e-3, atol=1e-5,
                       max_steps=_STORE_CAP + 1)
    assert try_fused_dopri5(X, fl, z0, np.asarray([0.0, 5.0]), cfg) is None


def test_bfloat16_operands_route_fused(forced_interpret):
    # bf16 controls/weights take the fused adaptive kernel too (the packer's
    # shared dtype policy upcasts at the boundary, the controller runs in
    # f32, and the output comes back bf16) and stay close to the f32 solve
    # of the same quantized problem.
    C, L, B, H, W = 2, 5, 3, 3, 8
    x, z0, w1, b1, w2, b2 = _setup(B, L, C, H, W)
    bf = jnp.bfloat16
    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    t = np.asarray([0.0, float(L - 1)])

    def run(dtype):
        X = CubicSpline(co.astype(dtype))
        fl = MLPVectorField(w1.astype(dtype), b1.astype(dtype),
                            w2.astype(dtype), b2.astype(dtype), H, C)
        return torchcde_tpu.cdeint(X=X, func=fl, z0=z0.astype(dtype), t=t,
                                   adjoint=False, method="dopri5",
                                   rtol=1e-3, atol=1e-4)

    out16 = run(bf)
    assert out16.dtype == bf
    # f32 on the bf16-quantized inputs: same fused program modulo the casts.
    out32 = run(jnp.float32)  # (inputs were f32 already; quantization noise
    # between the two runs is bounded by the bf16 input rounding)
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), rtol=0.06, atol=0.06)


def test_exhausted_budget_is_loud_fused(forced_interpret):
    # Parity with the XLA drivers' exhaustion contract (integrate.py): an
    # undersized step budget NaN-poisons the output instead of returning a
    # silently-truncated trajectory.
    from torchcde_tpu.solvers.fused_dopri_pallas import try_fused_dopri5
    from torchcde_tpu.solvers.integrate import SolverConfig

    C, H, W = 2, 3, 8
    args = _setup(2, 30, C, H, W)
    x, z0 = args[0], args[1]
    co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    X = CubicSpline(co)
    fl = MLPVectorField(args[2], args[3], args[4], args[5], H, C)
    cfg = SolverConfig(method="dopri5", rtol=1e-6, atol=1e-8, max_steps=2)
    out = try_fused_dopri5(X, fl, z0, np.asarray([0.0, 29.0]), cfg)
    assert out is not None
    assert np.isnan(np.asarray(out)[-1]).all()


# ---------------------------------------------------------------------------
# LinearInterpolation controls (the Neural RDE / log-ODE training path,
# reference example/logsignature_example.py:26): piecewise-constant dX/dt
# slabs with LEFT-continuous interval selection at knots, matching the
# reference's bucketize convention (interpolation_linear.py:203-210).
# ---------------------------------------------------------------------------

from torchcde_tpu.interpolation.linear import LinearInterpolation  # noqa: E402


def _linear_loss_fn(C, H, t, rtol, atol, adjoint=False):
    def loss(args, force):
        x_, z0_, w1_, b1_, w2_, b2_ = args
        co = torchcde_tpu.linear_interpolation_coeffs(x_)
        fused_pallas.force_fused_pallas(force)
        try:
            X = LinearInterpolation(co)
            fl = MLPVectorField(w1_, b1_, w2_, b2_, H, C)
            out = torchcde_tpu.cdeint(X=X, func=fl, z0=z0_, t=t,
                                      adjoint=adjoint, method="dopri5",
                                      rtol=rtol, atol=atol)
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out)), out

    return loss


@pytest.mark.parametrize("C", [2, 14])  # 14: depth-3 log-ODE channel count,
def test_linear_control_routes_and_matches_xla(forced_interpret, C):
    # only packable in the linear slope-slab layout (3*C > 16 slab rows).
    B, L, H, W = 3, 8, 3, 16
    args = _setup(B, L, C, H, W, seed=2, scale=0.5 / C)
    x, z0 = args[0], args[1]
    fl = MLPVectorField(args[2], args[3], args[4], args[5], H, C)
    X = LinearInterpolation(torchcde_tpu.linear_interpolation_coeffs(x))
    from torchcde_tpu.solvers.integrate import SolverConfig

    cfg = SolverConfig(method="dopri5", rtol=1e-6, atol=1e-8)
    out = fdp.try_fused_dopri5(X, fl, z0, np.asarray([0.0, float(L - 1)]), cfg)
    assert out is not None, "linear control must route to the fused kernel"

    t = jnp.asarray([0.0, float(L - 1)], jnp.float32)
    loss = _linear_loss_fn(C, H, t, 1e-6, 1e-8)
    (_, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(args, False)
    (_, out_fp), g_fp = jax.value_and_grad(loss, has_aux=True)(args, True)
    assert jnp.max(jnp.abs(out_ref - out_fp)) < 1e-3
    # Frozen-mesh gradients of two different meshes at the same tight
    # tolerance: with a piecewise-CONSTANT dX/dt the gradient field is
    # discontinuous across stage/knot crossings, so cross-mesh agreement is
    # inherently looser than the smooth cubic case; gradient EXACTNESS is
    # pinned by test_linear_gradients_match_differentiable_replay below.
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fp)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1.5e-1


def test_linear_control_left_continuous_at_knots(forced_interpret):
    """Stage-on-knot parity: probing the kernel's slab selection at times
    that are EXACTLY interior knots must return the PREVIOUS interval's
    slope — bitwise the reference bucketize semantics that X.derivative
    implements (searchsorted side='left' minus one)."""
    from jax.experimental import pallas as pl

    B, L, C = 1, 6, 2
    r = np.random.default_rng(3)
    x = jnp.asarray(r.standard_normal((B, L, C)).astype(np.float32))
    X = LinearInterpolation(torchcde_tpu.linear_interpolation_coeffs(x))
    n = L - 1
    # Pack the kernel's linear ct table: rows 0:C = slopes, rest padding.
    ct = jnp.concatenate(
        [X._derivs, jnp.zeros((B, n, fdp._SLAB - C), jnp.float32)], axis=-1)
    ct2 = jnp.pad(jnp.transpose(ct, (1, 2, 0)).reshape(n * fdp._SLAB, B),
                  ((0, 0), (0, 128 - B)))
    # Exact interior knots, the endpoints, and off-knot times.
    times = (0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 0.5, 2.5, 4.999)

    def probe_kernel(ct_ref, out_ref):
        for i, tv in enumerate(times):
            slab, _fr, _j = fdp._slab_at(ct_ref, jnp.float32(tv), 0.0, 1.0,
                                         n, left=True)
            out_ref[pl.ds(i * C, C), :] = slab[0:C]

    out = pl.pallas_call(
        probe_kernel,
        out_shape=jax.ShapeDtypeStruct((len(times) * C, 128), jnp.float32),
        interpret=True,
    )(ct2)
    for i, tv in enumerate(times):
        want = X.derivative(jnp.float32(tv))[0]  # reference semantics
        got = out[i * C:(i + 1) * C, 0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"t={tv}")


def test_linear_gradients_match_differentiable_replay_of_realised_mesh(
        forced_interpret):
    """Exact-gradient test for the linear-control kernel: replay its own
    accepted (t, dt) mesh as differentiable jnp with the SAME f32
    left-continuous interval rule and demand exact agreement."""
    B, L, C, H, W = 3, 6, 2, 3, 8
    args = _setup(B, L, C, H, W, seed=1, scale=0.3)
    x, z0, w1, b1, w2, b2 = args
    ts = np.asarray([0.0, 5.0])
    rtol, atol = 1e-5, 1e-7

    loss = _linear_loss_fn(C, H, jnp.asarray(ts, jnp.float32), rtol, atol)
    (l_f, out_f), g_f = jax.value_and_grad(loss, has_aux=True)(args, True)

    X = LinearInterpolation(torchcde_tpu.linear_interpolation_coeffs(x))
    grid = X.grid_points
    n = grid.shape[0] - 1
    Hp = fdp._round_up(H, 8)
    CHp = fdp._round_up(C * H, 8)
    Bp = 128
    ct = jnp.concatenate(
        [X._derivs, jnp.zeros((B, n, fdp._SLAB - C), jnp.float32)], axis=-1)
    ct2 = jnp.pad(jnp.transpose(ct, (1, 2, 0)).reshape(n * fdp._SLAB, B),
                  ((0, 0), (0, Bp - B)))
    z0t = jnp.pad(z0.T, ((0, Hp - H), (0, Bp - B)))
    w1t = jnp.pad(w1.T, ((0, 0), (0, Hp - H)))
    w2p = w2.reshape(W, H, C).transpose(0, 2, 1).reshape(W, C * H)
    w2t = jnp.pad(w2p.T, ((0, CHp - C * H), (0, 0)))
    b2c = jnp.pad(b2.reshape(H, C).T.reshape(C * H, 1),
                  ((0, CHp - C * H), (0, 0)))
    fl = MLPVectorField(w1, b1, w2, b2, H, C)
    rhs = make_cde_rhs(fl, X)
    f0 = rhs(jnp.float32(0.0), z0)
    dt0 = select_initial_step(rhs, jnp.float32(0.0), z0, 5, rtol, atol, f0)
    dt0 = jax.lax.stop_gradient(dt0).astype(jnp.float32).reshape(1, 1)
    solve = fdp._make_fused_dopri(
        n, Bp, (float(ts[1]),), float(ts[0]), float(ts[1]), float(grid[0]),
        float(np.diff(grid)[0]), rtol, atol, 4096, 2048, C, H, W, CHp, B,
        0.9, 10.0, 0.2, True, True)
    _z, _zfin, _dtfin, _zs, tst, dtst, cnt = solve._fwd_call(
        ct2, z0t, w1t, b1.reshape(W, 1), w2t, b2c, dt0)
    cnt = int(cnt[0, 0])
    t_arr = np.asarray(tst)[:cnt, 0].astype(np.float32)
    dt_arr = np.asarray(dtst)[:cnt, 0].astype(np.float32)
    assert cnt > 3
    bmid = _solve_dense_midpoint(DOPRI5)

    def replay_loss(args):
        x_, z0_, w1_, b1_, w2_, b2_ = args
        Xl = LinearInterpolation(torchcde_tpu.linear_interpolation_coeffs(x_))
        d_r = Xl._derivs

        def f(tval, z):
            # The kernel's left-continuous rule in the same f32 arithmetic.
            j = int(np.clip(np.ceil(np.float32(tval)) - 1, 0, n - 1))
            dx = d_r[:, j]
            h = jnp.maximum(z @ w1_ + b1_, 0)
            g = jnp.tanh(h @ w2_ + b2_)
            return jnp.sum(g.reshape(B, H, C) * dx[:, None, :], axis=-1)

        z = z0_
        emitted = None
        for s in range(cnt):
            t0s, dts = np.float32(t_arr[s]), np.float32(dt_arr[s])
            ks = [f(t0s, z)]
            for a_i, brow in zip(DOPRI5.alpha, DOPRI5.beta):
                y = z
                for q, coef in enumerate(brow):
                    if coef != 0.0:
                        y = y + (float(dts) * coef) * ks[q]
                ks.append(f(t0s + np.float32(a_i) * dts, y))
            z1 = z
            for q, coef in enumerate(DOPRI5.c_sol):
                if coef != 0.0:
                    z1 = z1 + (float(dts) * coef) * ks[q]
            y_mid = z
            for q, coef in enumerate(bmid):
                if coef != 0.0:
                    y_mid = y_mid + (float(dts) * coef) * ks[q]
            tk = float(ts[1])
            if (tk > t0s) and (tk <= t0s + dts):
                theta = (tk - float(t0s)) / float(dts)
                m = fdp._MINV
                p2, p3, p4 = theta**2, theta**3, theta**4
                cA = p2 * m[2][0] + p3 * m[1][0] + p4 * m[0][0]
                cB = p2 * m[2][1] + p3 * m[1][1] + p4 * m[0][1]
                cC = p2 * m[2][2] + p3 * m[1][2] + p4 * m[0][2]
                rA = z1 - z - float(dts) * ks[0]
                rB = float(dts) * (ks[-1] - ks[0])
                rC = y_mid - z - 0.5 * float(dts) * ks[0]
                emitted = (z + theta * float(dts) * ks[0]
                           + cA * rA + cB * rB + cC * rC)
            z = z1
        out = jnp.stack([z0_, emitted], axis=0)
        return jnp.sum(jnp.sin(out)), out

    (l_r, out_r), g_r = jax.value_and_grad(replay_loss, has_aux=True)(args)
    assert jnp.allclose(l_f, l_r, rtol=1e-5, atol=1e-6)
    assert jnp.allclose(out_f, jnp.moveaxis(out_r, 0, -2), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_f)):
        assert jnp.allclose(a, b, rtol=1e-4, atol=1e-5)


def test_linear_control_chunked_matches_xla(forced_interpret, monkeypatch):
    """Chunk streaming with linear controls: chunk boundaries clamp steps to
    knots, where the left-continuous rule must keep fwd/bwd consistent."""
    monkeypatch.setattr(fdp, "MAX_INTERVALS", 4)
    B, L, C, H, W = 3, 14, 2, 3, 8  # 13 intervals -> 4 chunks
    args = _setup(B, L, C, H, W, seed=9, scale=0.2)
    t = jnp.asarray([0.0, 3.3, 9.0, 13.0], jnp.float32)
    loss = _linear_loss_fn(C, H, t, 1e-6, 1e-8)
    (_, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(args, False)
    (_, out_fp), g_fp = jax.value_and_grad(loss, has_aux=True)(args, True)
    assert out_fp.shape == out_ref.shape
    assert jnp.max(jnp.abs(out_ref - out_fp)) < 2e-3
    assert bool(jnp.all(jnp.isfinite(out_fp)))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fp)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-2
    # Chunked adjoint=True routes the same kernel: exactly equal gradients.
    loss_adj = _linear_loss_fn(C, H, t, 1e-6, 1e-8, adjoint=True)
    (_, _), g_adj = jax.value_and_grad(loss_adj, has_aux=True)(args, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_adj),
                    jax.tree_util.tree_leaves(g_fp)):
        assert jnp.allclose(a, b, rtol=1e-6, atol=1e-7)
