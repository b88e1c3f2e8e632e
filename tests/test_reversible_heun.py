"""Reversible Heun: backend equivalence and the exact O(1)-memory adjoint.

Ports the torchsde-backend capability contracts (reference README.md:105;
test/test_cdeint.py:49-63 backend equivalence) and validates the specialised
reversible adjoint (solvers/reversible_adjoint.py): its gradients must equal
direct discretise-then-optimise gradients to machine precision — unlike the
continuous backsolve adjoint, which only converges at the solver's order.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchcde_tpu

rng = np.random.default_rng(23)


def _f(variable):
    return lambda t, z: jax.nn.sigmoid(z)[..., None] + variable


def test_reversible_heun_order():
    # Second order: halving the step should cut the error ~4x on a smooth CDE.
    path = jnp.asarray(rng.random((1, 10, 2)))
    X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path))
    v = jnp.asarray(rng.random((1, 1, 2)))
    z0 = jnp.asarray(rng.random((1, 2)))
    ref = torchcde_tpu.cdeint(X, _f(v), z0, X.interval, adjoint=False,
                              method="rk4", options=dict(step_size=0.01))
    errs = []
    for h in (0.5, 0.25, 0.125):
        out = torchcde_tpu.cdeint(X, _f(v), z0, X.interval, adjoint=False,
                                  method="reversible_heun", step_size=h)
        errs.append(float(jnp.max(jnp.abs(out - ref))))
    assert errs[1] < errs[0] / 2.5
    assert errs[2] < errs[1] / 2.5


def test_reversible_adjoint_exact():
    path = jnp.asarray(rng.random((2, 10, 3)))
    variable = jnp.asarray(rng.random((1, 1, 3)))
    z0 = jnp.asarray(rng.random((2, 3)))
    t_out = np.asarray([0.0, 4.5, 9.0])

    def loss(adjoint, path_, v_, z0_):
        X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path_))
        out = torchcde_tpu.cdeint(
            X, _f(v_), z0_, t_out, adjoint=adjoint,
            method="reversible_heun", step_size=0.5,
        )
        return jnp.sum(out[:, -1] ** 2)

    assert np.allclose(float(loss(True, path, variable, z0)),
                       float(loss(False, path, variable, z0)))
    ga = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(path, variable, z0)
    gd = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(path, variable, z0)
    for a, b in zip(ga, gd):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-12

    # and under jit
    gj = jax.jit(jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2)))(
        path, variable, z0
    )
    for a, b in zip(gj, ga):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_reversible_heun_torchsde_alias():
    # backend="torchsde", method="reversible_heun", dt=... must route here
    # (the reference's torchsde passthrough surface).
    path = jnp.asarray(rng.random((1, 8, 2)))
    X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path))
    v = jnp.asarray(rng.random((1, 1, 2)))
    z0 = jnp.asarray(rng.random((1, 3)))

    def func(t, z):
        return jnp.broadcast_to(jnp.tanh(z)[..., None], (1, 3, 2)) + v[..., :2]

    out1 = torchcde_tpu.cdeint(X, func, z0, X.interval, backend="torchsde",
                               method="reversible_heun", dt=1.0, adjoint=False)
    out2 = torchcde_tpu.cdeint(X, func, z0, X.interval, method="reversible_heun",
                               step_size=1.0, adjoint=False)
    assert np.allclose(np.asarray(out1), np.asarray(out2))


def test_vmap_over_solve():
    """cdeint composes with vmap (a pure-JAX capability the reference cannot
    offer): vmapping over a batch of coefficient sets matches looping."""
    paths = jnp.asarray(rng.random((3, 1, 8, 2)))
    v = jnp.asarray(rng.random((1, 1, 2)))
    z0 = jnp.asarray(rng.random((1, 3)))

    def solve(path):
        X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path))
        func = lambda t, z: jnp.broadcast_to(jnp.tanh(z)[..., None], (1, 3, 2)) + v[..., :2]
        return torchcde_tpu.cdeint(X, func, z0, np.asarray([0.0, 7.0]),
                                   adjoint=False, method="rk4",
                                   options=dict(step_size=1.0))

    batched = jax.vmap(solve)(paths)
    looped = jnp.stack([solve(paths[i]) for i in range(3)])
    assert np.allclose(np.asarray(batched), np.asarray(looped), atol=1e-12)


def test_reversible_adjoint_many_output_times():
    # 50 uniform output times: the interval loop must run as a scan (a single
    # program copy, compiling in seconds) and its gradients must still equal
    # the direct discretise-then-optimise gradients exactly.
    path = jnp.asarray(rng.random((2, 6, 3)))
    variable = jnp.asarray(rng.random((1, 1, 3)))
    z0 = jnp.asarray(rng.random((2, 3)))
    t_out = np.linspace(0.0, 5.0, 50)

    def loss(adjoint, path_, v_, z0_):
        X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path_))
        out = torchcde_tpu.cdeint(
            X, _f(v_), z0_, t_out, adjoint=adjoint,
            method="reversible_heun", step_size=0.05,
        )
        return jnp.sum(out ** 2)

    ga = jax.jit(jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2)))(
        path, variable, z0
    )
    gd = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(path, variable, z0)
    for a, b in zip(ga, gd):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-11


def test_reversible_adjoint_ragged_intervals():
    # Non-uniform per-interval step counts take the unrolled fallback; grads
    # must still match direct differentiation.
    path = jnp.asarray(rng.random((1, 8, 2)))
    variable = jnp.asarray(rng.random((1, 1, 2)))
    z0 = jnp.asarray(rng.random((1, 2)))
    t_out = np.asarray([0.0, 0.6, 3.0, 7.0])  # 1, 3, 5 steps at h=0.8

    def loss(adjoint, path_, v_, z0_):
        X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path_))
        out = torchcde_tpu.cdeint(
            X, _f(v_), z0_, t_out, adjoint=adjoint,
            method="reversible_heun", step_size=0.8,
        )
        return jnp.sum(out ** 2)

    ga = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(path, variable, z0)
    gd = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(path, variable, z0)
    for a, b in zip(ga, gd):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-11
