"""Additional solver-surface contracts: bosh3, jump_t, adjoint tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu

rng = np.random.default_rng(41)


def _problem():
    x = jnp.asarray(rng.standard_normal((2, 10, 2)))
    X = torchcde_tpu.CubicSpline(
        torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    )
    v = jnp.asarray(rng.random((1, 1, 2)))
    f = lambda t, z: jax.nn.sigmoid(z)[..., None] + v
    z0 = jnp.asarray(rng.random((2, 3)))
    return X, f, z0


def test_bosh3_converges():
    X, f, z0 = _problem()
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="rk4",
                              options=dict(step_size=0.01))
    out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="bosh3",
                              rtol=1e-6, atol=1e-8)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_jump_t():
    X, f, z0 = _problem()
    jumps = jnp.asarray(np.arange(1.0, 9.0))
    out_j, stats_j = torchcde_tpu.cdeint(
        X, f, z0, X.interval, adjoint=False, method="dopri5",
        options=dict(jump_t=jumps), return_stats=True,
    )
    out_n, stats_n = torchcde_tpu.cdeint(
        X, f, z0, X.interval, adjoint=False, method="dopri5", return_stats=True
    )
    assert np.isfinite(np.asarray(out_j)).all()
    # jump_t forces at least one step per inter-knot span
    assert int(stats_j["steps_accepted"]) >= 8
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="rk4",
                              options=dict(step_size=0.01))
    # landing on the Hermite kinks makes the solve *more* accurate
    err_j = np.abs(np.asarray(out_j) - np.asarray(ref)).max()
    assert err_j < 1e-3


def test_adjoint_tolerance_kwargs():
    X, f, z0 = _problem()

    def loss(z0_, **kw):
        out = torchcde_tpu.cdeint(X, f, z0_, X.interval, adjoint=True,
                                  method="dopri5", **kw)
        return jnp.sum(out[:, -1])

    g_default = jax.grad(loss)(z0)
    g_tight = jax.grad(lambda z: loss(z, adjoint_rtol=1e-8, adjoint_atol=1e-10))(z0)
    assert np.allclose(np.asarray(g_default), np.asarray(g_tight), rtol=1e-2, atol=1e-4)


def test_log_ode_validation():
    x = jnp.asarray(rng.standard_normal((2, 10, 2)))
    with pytest.raises(ValueError):
        torchcde_tpu.logsig_windows(x, 0, 2.0)
    with pytest.raises(ValueError):
        torchcde_tpu.logsig_windows(x, 2, -1.0)


def _adjoint_params_problem():
    # A tame, well-conditioned problem with its own rng: backsolve-adjoint
    # gradient discrepancies stay at O(tolerance) instead of being amplified
    # by trajectory sensitivity.
    r = np.random.default_rng(123)
    coeffs_raw = jnp.asarray(r.standard_normal((2, 6, 2)) * 0.5)
    v = jnp.asarray(r.random((1, 1, 2)) * 0.5)
    z0 = jnp.asarray(r.random((2, 3)))
    return coeffs_raw, v, z0


def test_adjoint_params_empty_skips_const_grads():
    """adjoint_params=() (reference solver.py:207-222): no adjoint gradients
    for closed-over arrays; z0 gradients are unaffected."""
    coeffs_raw, v, z0 = _adjoint_params_problem()

    def loss(coeffs_raw, v, z0, **kw):
        X = torchcde_tpu.CubicSpline(
            torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(coeffs_raw)
        )
        f = lambda t, z: 0.3 * jnp.tanh(z)[..., None] + v
        out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=True,
                                  rtol=1e-7, atol=1e-9, **kw)
        return jnp.sum(out[:, -1] ** 2)

    g_full = jax.grad(loss, argnums=(0, 1, 2))(coeffs_raw, v, z0)
    g_none = jax.grad(lambda *a: loss(*a, adjoint_params=()), argnums=(0, 1, 2))(
        coeffs_raw, v, z0
    )
    assert float(jnp.max(jnp.abs(g_full[0]))) > 1e-6  # full mode really flows
    assert float(jnp.max(jnp.abs(g_none[0]))) == 0.0
    assert float(jnp.max(jnp.abs(g_none[1]))) == 0.0
    # The augmented adjoint state shrinks without a_consts, changing the
    # adaptive controller's error norm — gradients agree to O(tolerance),
    # the backsolve adjoint's inherent accuracy.
    np.testing.assert_allclose(
        np.asarray(g_none[2]), np.asarray(g_full[2]), rtol=1e-3, atol=1e-5
    )


def test_adjoint_params_selective():
    """Restricting adjoint_params to one closed-over tensor: it still matches
    the direct-differentiation gradient, everything else gets zeros."""
    coeffs_raw, v, z0 = _adjoint_params_problem()

    def loss(coeffs_raw, v, z0, adjoint, restrict):
        X = torchcde_tpu.CubicSpline(
            torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(coeffs_raw)
        )
        f = lambda t, z: 0.3 * jnp.tanh(z)[..., None] + v
        kw = dict(adjoint_params=(v,)) if restrict else {}
        out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=adjoint,
                                  rtol=1e-7, atol=1e-9, **kw)
        return jnp.sum(out[:, -1] ** 2)

    g_sel = jax.grad(lambda *a: loss(*a, True, True), argnums=(0, 1))(coeffs_raw, v, z0)
    g_dir = jax.grad(lambda *a: loss(*a, False, False), argnums=(0, 1))(coeffs_raw, v, z0)
    assert float(jnp.max(jnp.abs(g_sel[0]))) == 0.0
    np.testing.assert_allclose(
        np.asarray(g_sel[1]), np.asarray(g_dir[1]), rtol=1e-3, atol=1e-5
    )


def test_bfloat16_end_to_end():
    # Serving-dtype contract: coefficients, spline evaluation and both solve
    # modes run in bfloat16, preserve the dtype, and stay near the f32 path
    # (bf16 has ~3 decimal digits; the CDE accumulates over ~20 steps).
    r = np.random.default_rng(0)
    x = r.standard_normal((8, 20, 3)).astype(np.float32)
    W = jnp.asarray(r.standard_normal((4, 4 * 3)) * 0.1)

    def run(dtype):
        co = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
            jnp.asarray(x, dtype)
        )
        X = torchcde_tpu.CubicSpline(co)
        z0 = jnp.zeros((8, 4), dtype)
        Wd = W.astype(dtype)

        def f(t, z):
            return jnp.tanh(z @ Wd).reshape(z.shape[:-1] + (4, 3))

        out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                                  method="rk4", options={"step_size": 1.0})
        assert out.dtype == dtype
        return np.asarray(out, np.float64)

    o16 = run(jnp.bfloat16)
    o32 = run(jnp.float32)
    assert np.isfinite(o16).all()
    scale = np.abs(o32).max() + 1e-6
    assert np.max(np.abs(o16 - o32)) / scale < 0.1


@pytest.mark.parametrize("method,rtol,atol,tol",
                         [("dopri8", 1e-7, 1e-9, 1e-5),
                          ("adaptive_heun", 1e-6, 1e-8, 1e-3),
                          ("fehlberg2", 1e-6, 1e-8, 1e-3)])
def test_extra_adaptive_methods_converge(method, rtol, atol, tol):
    # The torchdiffeq method= passthrough breadth the reference consumes
    # (/root/reference/torchcde/solver.py:226-227): dopri8, adaptive_heun and
    # fehlberg2 must solve to their tolerances like bosh3/dopri5 do.
    X, f, z0 = _problem()
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="rk4",
                              options=dict(step_size=0.005))
    out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method=method,
                              rtol=rtol, atol=atol)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=tol)


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams", "fixed_adams"])
def test_adams_methods_converge(method):
    # The fixed-grid multistep names of the torchdiffeq passthrough
    # (/root/reference/torchcde/solver.py:226-227).  Spline-driven CDEs have
    # derivative kinks at the knots, which any multistep history straddles,
    # so the assertion is error decay + accuracy rather than smooth-problem
    # order (see the _make_adams_stepper docstring).  Own-seed problem: the
    # module rng is ordering-dependent and the decay bound is quantitative.
    r = np.random.default_rng(7)
    x = jnp.asarray(r.standard_normal((2, 10, 2)))
    X = torchcde_tpu.CubicSpline(
        torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    )
    v = jnp.asarray(r.random((1, 1, 2)))
    f = lambda t, z: jax.nn.sigmoid(z)[..., None] + v
    z0 = jnp.asarray(r.random((2, 3)))
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="rk4",
                              options=dict(step_size=0.005))
    errs = []
    for h in (0.1, 0.0125):
        out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                                  method=method, options=dict(step_size=h))
        errs.append(np.abs(np.asarray(out) - np.asarray(ref)).max())
    # Observed decay is clean order 2 (kink-limited): 8x refinement => ~64x.
    assert errs[1] < errs[0] / 16
    assert errs[1] < 5e-4


def test_adams_grad_paths():
    # Gradients flow through the stateful fixed-step loop (direct bounded
    # loop and custom_vjp adjoint agree), and the bootstrap cond does not
    # break reverse-mode.
    X, f, z0 = _problem()

    def loss(z0_, adjoint, m):
        out = torchcde_tpu.cdeint(X, f, z0_, X.interval, adjoint=adjoint,
                                  method=m, options=dict(step_size=0.05))
        return jnp.sum(out[:, -1])

    for m in ("explicit_adams", "implicit_adams"):
        g_adj = jax.grad(lambda z: loss(z, True, m))(z0)
        g_dir = jax.grad(lambda z: loss(z, False, m))(z0)
        assert np.isfinite(np.asarray(g_adj)).all()
        np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_dir),
                                   rtol=1e-3, atol=5e-4)


def test_dopri8_grad_paths():
    # Gradients flow through the restart-per-output-time adaptive path too.
    X, f, z0 = _problem()

    def loss(z0_, adjoint):
        out = torchcde_tpu.cdeint(X, f, z0_, X.interval, adjoint=adjoint,
                                  method="dopri8", rtol=1e-5, atol=1e-7)
        return jnp.sum(out[:, -1])

    g_adj = jax.grad(lambda z: loss(z, True))(z0)
    g_dir = jax.grad(lambda z: loss(z, False))(z0)
    assert np.isfinite(np.asarray(g_adj)).all()
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_dir),
                               rtol=1e-3, atol=1e-5)


def test_jump_t_ignored_on_fixed_step_warns():
    X, f, z0 = _problem()
    jumps = jnp.asarray(np.arange(1.0, 9.0))
    with pytest.warns(UserWarning, match="jump_t.*ignored by fixed-step"):
        torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="rk4",
                            options=dict(step_size=0.5, jump_t=jumps))
    with pytest.warns(UserWarning, match="jump_t.*ignored by fixed-step"):
        torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=True,
                            method="reversible_heun",
                            options=dict(step_size=0.5, jump_t=jumps))
    # Adaptive methods without step_size honour jump_t: no warning.
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False, method="dopri5",
                            options=dict(jump_t=jumps))


def test_adaptive_budget_derived_from_knots(monkeypatch):
    # With differentiable=True every budgeted iteration executes and is
    # checkpointed, so the default adaptive budget is sized from the
    # control's knot count (integrate.py) instead of the flat 4096 — and the
    # truncated loop must not change the answer.
    import torchcde_tpu.solvers.integrate as integrate_mod

    captured = []
    orig = integrate_mod._integrate_adaptive_dense

    def spy(rhs, z0, ts, dt0, state0, cfg, stepper, max_steps, jump_t,
            differentiable):
        captured.append((max_steps, differentiable))
        return orig(rhs, z0, ts, dt0, state0, cfg, stepper, max_steps, jump_t,
                    differentiable)

    monkeypatch.setattr(integrate_mod, "_integrate_adaptive_dense", spy)

    x = jnp.asarray(rng.standard_normal((2, 100, 2)))
    X = torchcde_tpu.CubicSpline(
        torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    )
    f = lambda t, z: jnp.tanh(z)[..., None] * jnp.asarray([[0.1, -0.05]])
    z0 = jnp.asarray(rng.random((2, 2)))

    def run(**kw):
        return torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                                   method="dopri5", **kw)

    out = jax.jit(run)()  # differentiable grad-ready path
    (m_diff, was_diff), = captured
    assert was_diff
    # 100 knots at the default tolerances: 8 steps/knot with a 1024 floor
    # (dynamics can demand far more steps than knots — see integrate.py),
    # still well below the flat 4096.
    assert m_diff == 1024
    captured.clear()

    # Tighter tolerances widen the derived budget.
    run(rtol=1e-8, atol=1e-10)
    (m_tight, _), = captured
    assert 1024 < m_tight <= 4096
    captured.clear()

    # Explicit max_steps always wins.
    run(max_steps=77)
    (m_explicit, _), = captured
    assert m_explicit == 77
    captured.clear()

    # And the derived budget doesn't truncate the solve: same answer as the
    # flat-budget loop.
    ref = run(max_steps=4096)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-8)


def test_exhausted_budget_is_loud():
    # An undersized step budget must NOT return a silently-truncated
    # trajectory: the adaptive drivers NaN-poison the output when the loop
    # exhausts before reaching the end time (the jit-compatible form of
    # torchdiffeq's max_num_steps RuntimeError).
    x = jnp.asarray(rng.standard_normal((2, 40, 2)))
    X = torchcde_tpu.CubicSpline(
        torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    )
    f = lambda t, z: jnp.tanh(z)[..., None] * jnp.asarray([[0.3, -0.2]])
    z0 = jnp.asarray(rng.random((2, 2)))

    ok = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                             method="dopri5")
    assert np.isfinite(np.asarray(ok)).all()

    # max_steps=2 cannot possibly cover 39 intervals.
    bad = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                              method="dopri5", max_steps=2)
    assert np.isnan(np.asarray(bad)[..., -1, :]).all()

    # Same contract on the adjoint's internal (non-differentiable) solve.
    bad_adj = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=True,
                                  method="dopri5", max_steps=2)
    assert np.isnan(np.asarray(bad_adj)[..., -1, :]).all()


def test_heun3_third_order_convergence():
    # torchdiffeq's fixed-grid "heun3": halving the step must cut the error
    # by ~8x (3rd order) against a tight rk4 reference.
    X, f, z0 = _problem()
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                              method="rk4", options=dict(step_size=0.005))
    errs = []
    for h in (0.4, 0.2, 0.1):
        out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                                  method="heun3", options=dict(step_size=h))
        errs.append(float(jnp.max(jnp.abs(out - ref))))
    assert errs[0] / errs[1] > 5.0 and errs[1] / errs[2] > 5.0, errs


def test_scipy_solver_backend():
    # torchdiffeq's method="scipy_solver" escape hatch: host-side
    # solve_ivp stepping with the options={"solver": ...} passthrough.
    X, f, z0 = _problem()
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                              method="dopri5", rtol=1e-8, atol=1e-10)
    for solver in ("RK45", "LSODA"):
        out = torchcde_tpu.cdeint(
            X, f, z0, X.interval, adjoint=False, method="scipy_solver",
            rtol=1e-8, atol=1e-10, options=dict(solver=solver))
        assert out.shape == ref.shape
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5), solver


def test_scipy_solver_rejects_traced_and_adjoint():
    X, f, z0 = _problem()
    with pytest.raises(ValueError, match="host-side"):
        jax.jit(lambda z: torchcde_tpu.cdeint(
            X, f, z, X.interval, adjoint=False, method="scipy_solver"))(z0)
    # adjoint=True is cdeint's DEFAULT and torchdiffeq's odeint_adjoint
    # accepts scipy_solver, so it must RUN (warning, gradient-free) rather
    # than error.
    with pytest.warns(UserWarning, match="adjoint=True is ignored"):
        out = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=True,
                                  method="scipy_solver")
    ref = torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                              method="scipy_solver")
    assert np.allclose(np.asarray(out), np.asarray(ref))
    # per_sample and batched t have no host-side meaning: explicit errors.
    with pytest.raises(ValueError, match="per_sample"):
        torchcde_tpu.cdeint(X, f, z0, X.interval, adjoint=False,
                            method="scipy_solver",
                            options=dict(per_sample=True))
    # Batched per-sample t with scipy_solver: the per_sample rejection
    # fires before _cdeint_scipy ever sees a 2-D t (which would reach
    # solve_ivp with a row where a scalar belongs).
    t2 = jnp.stack([X.interval, X.interval])
    with pytest.raises(ValueError, match="per_sample"):
        torchcde_tpu.cdeint(X, f, z0, t2, adjoint=False,
                            method="scipy_solver",
                            options=dict(per_sample=True))
