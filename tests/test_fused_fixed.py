"""Knot-aligned fused fixed-step path: must be taken when applicable and be
bit-identical to the general interval-clamped solver."""

import jax
import jax.numpy as jnp
import numpy as np

import torchcde_tpu as tc
from torchcde_tpu.solvers.fused_fixed import try_fused_fixed
from torchcde_tpu.solvers.integrate import SolverConfig, odeint
from torchcde_tpu.solvers.terms import make_cde_rhs

rng = np.random.default_rng(31)


def _setup():
    path = jnp.asarray(rng.random((2, 12, 3)))
    v = jnp.asarray(rng.random((1, 1, 3)))
    f = lambda t, z: jax.nn.sigmoid(z)[..., None] + v
    X = tc.CubicSpline(tc.natural_cubic_coeffs(path))
    z0 = jnp.asarray(rng.random((2, 4)))
    return path, f, X, z0


def test_fused_taken_and_identical():
    _path, f, X, z0 = _setup()
    ts = np.asarray([0.0, 4.0, 11.0])
    fused = try_fused_fixed(X, f, z0, ts, "rk4", 0.5)
    assert fused is not None
    gen = odeint(make_cde_rhs(f, X), z0, jnp.asarray(ts), SolverConfig(method="rk4", step_size=0.5))
    assert np.array_equal(np.asarray(fused), np.asarray(gen)) or np.allclose(
        np.asarray(fused), np.asarray(gen), rtol=0, atol=1e-15
    )


def test_fused_under_jit_and_grad():
    path, f, X, z0 = _setup()
    ts = np.asarray([0.0, 11.0])

    def loss(p):
        Xp = tc.CubicSpline(tc.natural_cubic_coeffs(p))
        out = tc.cdeint(Xp, f, z0, ts, adjoint=False, method="rk4",
                        options=dict(step_size=1.0))
        return jnp.sum(out[:, -1] ** 2)

    l_eager = float(loss(path))
    l_jit = float(jax.jit(loss)(path))
    assert np.isclose(l_eager, l_jit)
    g = jax.jit(jax.grad(loss))(path)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_fused_declines_properly():
    _path, f, X, z0 = _setup()
    # non-dividing step
    assert try_fused_fixed(X, f, z0, np.asarray([0.0, 11.0]), "rk4", 0.7) is None
    # adaptive method
    assert try_fused_fixed(X, f, z0, np.asarray([0.0, 11.0]), "dopri5", 1.0) is None
    # off-grid output time
    assert try_fused_fixed(X, f, z0, np.asarray([0.0, 4.5, 11.0]), "rk4", 0.5) is None
    # linear control (left-continuity semantics differ at knots)
    Xl = tc.LinearInterpolation(tc.linear_interpolation_coeffs(jnp.asarray(rng.random((2, 12, 3)))))
    assert try_fused_fixed(Xl, f, z0, np.asarray([0.0, 11.0]), "rk4", 1.0) is None
    # but cdeint still solves all of these via the general path
    out = tc.cdeint(X, f, z0, np.asarray([0.0, 4.5, 11.0]), adjoint=False,
                    method="rk4", options=dict(step_size=0.7))
    assert np.isfinite(np.asarray(out)).all()
