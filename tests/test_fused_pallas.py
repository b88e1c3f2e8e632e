"""Equivalence tests for the fused Pallas CDE solve (solvers/fused_pallas.py).

Run in Pallas interpreter mode on CPU (the kernels themselves are exercised
on-chip by tests_tpu/test_on_tpu.py), against the general step-scan path —
forward values and every gradient path (z0, MLP parameters, coefficients),
the contract of reference test/test_tricks.py:21-49.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu
from torchcde_tpu.interpolation.cubic import CubicSpline
from torchcde_tpu.solvers import fused_pallas
from torchcde_tpu.solvers.terms import MLPVectorField

# Interpret-mode Pallas kernels are ~100x slower than compiled; this module
# is part of the slow tier (run the fast core suite with -m 'not slow').
pytestmark = pytest.mark.slow


@pytest.fixture
def forced_interpret():
    fused_pallas.force_fused_pallas(True)
    yield
    fused_pallas.force_fused_pallas(None)


def _setup(B, L, C, H, W, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x)
    )
    w1 = jnp.asarray(rng.standard_normal((H, W)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((W,)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((W, H * C)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((H * C,)) * 0.3, jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    return coeffs, (z0, w1, b1, w2, b2)


def _solve(args, coeffs, C, H, t, method, step_size, use_fused):
    z0, w1, b1, w2, b2 = args
    fused_pallas.force_fused_pallas(True if use_fused else False)
    try:
        X = CubicSpline(coeffs)
        field = MLPVectorField(w1, b1, w2, b2, H, C)
        return torchcde_tpu.cdeint(
            X=X, func=field, z0=z0, t=t, adjoint=False, method=method,
            options={"step_size": step_size},
        )
    finally:
        fused_pallas.force_fused_pallas(None)


@pytest.mark.parametrize(
    "method,step_size,B,H,W",
    [("rk4", 1.0, 5, 4, 16), ("rk4", 0.5, 3, 8, 16),
     ("midpoint", 1.0, 2, 3, 8), ("heun", 0.25, 2, 3, 8),
     ("euler", 1.0, 2, 3, 8)],
)
def test_forward_and_grads_match_general_path(forced_interpret, method,
                                              step_size, B, H, W):
    C, L = 3, 6
    coeffs, args = _setup(B, L, C, H, W)
    X = CubicSpline(coeffs)
    t = X.interval

    def loss(args, coeffs, use_fused):
        out = _solve(args, coeffs, C, H, t, method, step_size, use_fused)
        return jnp.sum(jnp.sin(out)), out

    (l_ref, out_ref), (g_ref, gc_ref) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(args, coeffs, False)
    (l_fp, out_fp), (g_fp, gc_fp) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(args, coeffs, True)

    assert out_fp.shape == out_ref.shape
    assert jnp.allclose(out_ref, out_fp, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((g_ref, gc_ref)),
                    jax.tree_util.tree_leaves((g_fp, gc_fp))):
        assert jnp.allclose(a, b, rtol=1e-3, atol=1e-4)


def test_interior_output_times_cotangents(forced_interpret):
    """Output times at interior knots route cotangents into the backward
    kernel's lambda-accumulation; check grads still match."""
    C, H, W, B, L = 2, 3, 8, 3, 7
    coeffs, args = _setup(B, L, C, H, W, seed=3)
    t = jnp.asarray([0.0, 2.0, 4.0, 6.0], jnp.float32)

    def loss(args, coeffs, use_fused):
        out = _solve(args, coeffs, C, H, t, "rk4", 1.0, use_fused)
        return jnp.sum(out * jnp.arange(1.0, 5.0)[:, None]), out

    (_, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(
        args, coeffs, False)
    (_, out_fp), g_fp = jax.value_and_grad(loss, has_aux=True)(
        args, coeffs, True)
    assert jnp.allclose(out_ref, out_fp, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fp)):
        assert jnp.allclose(a, b, rtol=1e-3, atol=1e-4)


def test_dispatches_inside_neural_cde(forced_interpret):
    """The built-in model's train step hits the fused path (cde_func returns
    an MLPVectorField) and still produces finite, matching losses."""
    import optax

    from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
    from torchcde_tpu.models.training import make_train_step

    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=4, output_channels=1, width=16,
        interpolation="cubic", solver="rk4", adjoint=False, step_size=1.0,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 6, 3)).astype(np.float32)
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x)
    )
    y = jnp.asarray((rng.random(8) > 0.5).astype(np.float32))
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, optimizer))
    params2, _, loss_fused = step(params, opt_state, coeffs, y)
    assert jnp.isfinite(loss_fused)

    fused_pallas.force_fused_pallas(False)
    step2 = jax.jit(make_train_step(cfg, optimizer))
    _, _, loss_plain = step2(params, opt_state, coeffs, y)
    assert jnp.allclose(loss_fused, loss_plain, rtol=1e-5, atol=1e-6)
    # The updated parameters moved (it really trained).
    assert not jnp.allclose(params2["func1"]["w"], params["func1"]["w"])


def test_declines_off_caps(forced_interpret):
    """Non-uniform grids decline the Pallas path but still solve correctly
    via the general path."""
    C, H, W, B, L = 3, 4, 16, 2, 5
    coeffs, args = _setup(B, L, C, H, W, seed=5)
    z0, w1, b1, w2, b2 = args
    t_knots = jnp.asarray([0.0, 1.0, 2.5, 3.0, 4.0], jnp.float32)
    X = CubicSpline(coeffs, t_knots)
    field = MLPVectorField(w1, b1, w2, b2, H, C)
    out = torchcde_tpu.cdeint(X=X, func=field, z0=z0, t=X.interval,
                              adjoint=False, method="rk4",
                              options={"step_size": 0.5})
    assert out.shape == (B, 2, H)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_adjoint_routes_to_fused_kernel_and_matches_backsolve(forced_interpret):
    """adjoint=True fixed-step MLP solves route through the fused kernel; its
    exact-reverse gradients must agree with the continuous backsolve."""
    C, H, W, B, L = 3, 4, 16, 3, 6
    coeffs, args = _setup(B, L, C, H, W, seed=7)
    # Tame the vector field so the backsolve's state reconstruction stays
    # accurate enough to be a meaningful cross-check.
    z0, w1, b1, w2, b2 = args
    args = (z0, 0.4 * w1, 0.4 * b1, 0.4 * w2, 0.4 * b2)
    X = CubicSpline(coeffs)
    t = X.interval

    def loss(args, coeffs, use_fused):
        z0, w1, b1, w2, b2 = args
        fused_pallas.force_fused_pallas(True if use_fused else False)
        try:
            Xl = CubicSpline(coeffs)
            field = MLPVectorField(w1, b1, w2, b2, H, C)
            out = torchcde_tpu.cdeint(X=Xl, func=field, z0=z0, t=t,
                                      adjoint=True, method="rk4",
                                      options={"step_size": 1.0})
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out))

    def loss_direct(args, coeffs):
        z0, w1, b1, w2, b2 = args
        fused_pallas.force_fused_pallas(False)
        try:
            Xl = CubicSpline(coeffs)
            field = MLPVectorField(w1, b1, w2, b2, H, C)
            out = torchcde_tpu.cdeint(X=Xl, func=field, z0=z0, t=t,
                                      adjoint=False, method="rk4",
                                      options={"step_size": 1.0})
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out))

    g_adj = jax.grad(loss, argnums=(0, 1))(args, coeffs, False)
    g_fp = jax.grad(loss, argnums=(0, 1))(args, coeffs, True)
    g_dir = jax.grad(loss_direct, argnums=(0, 1))(args, coeffs)
    # The fused kernel reverses the exact forward computation, so its
    # adjoint-mode gradients equal DIRECT backprop tightly...
    for a, b in zip(jax.tree_util.tree_leaves(g_dir),
                    jax.tree_util.tree_leaves(g_fp)):
        assert jnp.allclose(a, b, rtol=1e-3, atol=1e-4)
    # ...while the continuous backsolve only approximates them (state
    # reconstruction error at step_size=1.0) — sanity-check directionality.
    va = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_adj)])
    vb = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_fp)])
    cos = jnp.vdot(va, vb) / (jnp.linalg.norm(va) * jnp.linalg.norm(vb))
    assert cos > 0.9, cos


@pytest.mark.parametrize("adjoint", [True, False])
@pytest.mark.parametrize("H", [4, 8])  # H=8: matrix-free VPU selection path
def test_fused_reversible_heun_matches_xla_path(forced_interpret, adjoint, H):
    """Fused reversible-Heun (both adjoint modes) vs the XLA reversible /
    direct paths.  Gradients are taken w.r.t. the raw data x (through the
    Hermite construction), z0 and the MLP parameters — quantities identical
    under either C1-equivalent knot-evaluation routing."""
    C, W, B, L = 3, 16, 3, 7
    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((B, L, C)).astype(np.float32))
    w1 = jnp.asarray(r.standard_normal((H, W)) * 0.2, jnp.float32)
    b1 = jnp.asarray(r.standard_normal((W,)) * 0.2, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((W, H * C)) * 0.2, jnp.float32)
    b2 = jnp.asarray(r.standard_normal((H * C,)) * 0.2, jnp.float32)
    z0 = jnp.asarray(r.standard_normal((B, H)).astype(np.float32))
    t = jnp.asarray([0.0, 3.0, 6.0], jnp.float32)

    def loss(args, use_fused):
        x_, z0_, w1_, b1_, w2_, b2_ = args
        co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x_)
        fused_pallas.force_fused_pallas(True if use_fused else False)
        try:
            X = CubicSpline(co)
            field = MLPVectorField(w1_, b1_, w2_, b2_, H, C)
            out = torchcde_tpu.cdeint(X=X, func=field, z0=z0_, t=t,
                                      adjoint=adjoint, method="reversible_heun",
                                      backend="torchsde", dt=0.5)
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out)), out

    args = (x, z0, w1, b1, w2, b2)
    (_, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(args, False)
    (_, out_fp), g_fp = jax.value_and_grad(loss, has_aux=True)(args, True)
    assert out_fp.shape == out_ref.shape
    assert jnp.allclose(out_ref, out_fp, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fp)):
        assert jnp.allclose(a, b, rtol=1e-3, atol=1e-4)


def test_non_multiple_large_batch_pads_to_full_tiles(forced_interpret):
    # Regression: round_up(B, 128) in (1024, 2048) that is not a multiple of
    # the 1024-lane tile used to drop lanes and crash the output reshape.
    C, H, W = 2, 3, 8
    coeffs, args = _setup(1100, 4, C, H, W)
    t = np.asarray([0.0, 3.0])
    out = _solve(args, coeffs, C, H, t, "euler", 1.0, True)
    ref = _solve(args, coeffs, C, H, t, "euler", 1.0, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bfloat16_operands_route_fused_and_match(forced_interpret):
    # bf16 models get the fused kernel too: the fixed-step driver keeps the
    # coefficient slabs bf16 in HBM (the dominant stream — kernels upcast
    # each block on load and emit bf16 slab cotangents), upcasts the
    # carried-state operands to f32, and results/cotangents come back bf16.
    # Mirrors the bf16 end-to-end contract test for the XLA path
    # (tests/test_cdeint.py).
    C, L, B, H, W = 3, 6, 4, 4, 16
    coeffs, args = _setup(B, L, C, H, W)
    bf = jnp.bfloat16
    coeffs16 = coeffs.astype(bf)
    args16 = tuple(a.astype(bf) for a in args)
    X16 = CubicSpline(coeffs16)
    t = X16.interval

    field = MLPVectorField(args16[1], args16[2], args16[3], args16[4], H, C)
    p = fused_pallas._pack_operands(
        X16._b, X16._two_c, X16._three_d, args16[0], field, L - 1,
        ct_store="native")
    assert p is not None and p.out_dtype == bf
    assert p.ct2.dtype == bf       # slabs stored bf16
    assert p.z0t.dtype == jnp.float32  # carried state solves in f32

    def loss(a, cf, use):
        out = _solve(a, cf, C, H, t, "rk4", 1.0, use)
        assert out.dtype == bf
        return jnp.sum(jnp.sin(out.astype(jnp.float32))), out

    (_, out_ref), _ = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(args16, coeffs16, False)
    (_, out_fp), (g_fp, gc_fp) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(args16, coeffs16, True)

    # Cross-path forward check: the XLA path carries the state in bf16 while
    # the kernel accumulates in f32, so agreement is to bf16 resolution.
    np.testing.assert_allclose(
        np.asarray(out_fp, np.float32), np.asarray(out_ref, np.float32),
        rtol=0.06, atol=0.06)

    # Gradient check against the f32 fused solve on the SAME (already
    # bf16-quantized) inputs.  The bf16 solve feeds the MXU bf16 operands
    # (f32 accumulation), so the two programs differ by per-stage bf16
    # rounding — which can flip relu kinks and make individual entries
    # diverge.  The contract is therefore a relative-norm one: each
    # gradient leaf agrees to a few percent in Frobenius norm.
    def loss32(a, cf):
        out = _solve(a, cf, C, H, t, "rk4", 1.0, True)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    args32 = tuple(a.astype(jnp.float32) for a in args16)
    g32, gc32 = jax.grad(loss32, argnums=(0, 1))(
        args32, coeffs16.astype(jnp.float32))
    for ga, gb in zip(jax.tree_util.tree_leaves((g_fp, gc_fp)),
                      jax.tree_util.tree_leaves((g32, gc32))):
        assert ga.dtype == bf
        a32 = np.asarray(ga, np.float32).ravel()
        b32 = np.asarray(gb, np.float32).ravel()
        denom = max(float(np.linalg.norm(b32)), 1e-6)
        assert float(np.linalg.norm(a32 - b32)) / denom < 0.05, (
            np.abs(a32 - b32).max(), denom)


def test_mixed_dtype_operands_decline(forced_interpret):
    # bf16 coefficients against f32 weights: the packer declines (the XLA
    # path's promotion semantics are the contract there) instead of silently
    # casting one side.
    C, L, B, H, W = 3, 6, 2, 4, 16
    coeffs, args = _setup(B, L, C, H, W)
    X16 = CubicSpline(coeffs.astype(jnp.bfloat16))
    field = MLPVectorField(args[1], args[2], args[3], args[4], H, C)
    p = fused_pallas._pack_operands(
        X16._b, X16._two_c, X16._three_d, args[0], field, L - 1)
    assert p is None


def test_bfloat16_reversible_heun_routes_fused(forced_interpret):
    C, L, B, H, W = 3, 6, 2, 3, 8
    coeffs, args = _setup(B, L, C, H, W)
    bf = jnp.bfloat16
    t = CubicSpline(coeffs).interval

    def run(dtype):
        a = tuple(x.astype(dtype) for x in args)
        return _solve(a, coeffs.astype(dtype), C, H, t,
                      "reversible_heun", 1.0, True)

    out16 = run(bf)
    assert out16.dtype == bf
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(run(jnp.float32)),
                               rtol=0.06, atol=0.06)
