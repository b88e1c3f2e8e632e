"""Gradient-path tests — the crown jewels.

Port of /root/reference/test/test_tricks.py: gradients must reach the raw
path, the interpolation coefficients, z0, the vector-field parameters, the
knot times and the output times, under both adjoint and direct backprop and
both fixed (rk4) and adaptive (dopri5) solvers; and direct-vs-adjoint
gradients must agree for fixed-step solves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu

rng = np.random.default_rng(5)


def _func(variable):
    def f(t, z):
        return jax.nn.sigmoid(z)[..., None] + variable

    return f


@pytest.mark.parametrize("method,kwargs", [("rk4", {"options": {"step_size": 1.0}}),
                                           ("dopri5", {})])
@pytest.mark.parametrize("adjoint", [True, False])
def test_grad_paths(method, adjoint, kwargs):
    t = jnp.linspace(0, 9, 10)
    path = jnp.asarray(rng.random((1, 10, 3)))
    variable = jnp.asarray(rng.random((1, 1, 3)))
    z0 = jnp.asarray(rng.random((1, 3)))
    t_out = jnp.asarray([0.0, 9.0])

    def loss(t_, path_, variable_, z0_, t_out_):
        coeffs = torchcde_tpu.natural_cubic_coeffs(path_, t_)
        spline = torchcde_tpu.CubicSpline(coeffs, t_)
        z = torchcde_tpu.cdeint(
            X=spline, func=_func(variable_), z0=z0_, t=t_out_, adjoint=adjoint,
            method=method, rtol=1e-4, atol=1e-6, **kwargs,
        )
        assert z.shape == (1, 2, 3)
        return jnp.sum(z[:, 1])

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(t, path, variable, z0, t_out)
    names = ("t", "path", "variable", "z0", "t_out")
    for name, g in zip(names, grads):
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert np.abs(g).sum() > 0, name


def test_stacked_cdes():
    """Gradients flow through CDEs stacked on top of one another
    (reference test_stacked_paths :54-106; the no-double-traversal property is
    structural in JAX's functional autodiff)."""
    for adjoint in (False, True):
        first_path = jnp.asarray(rng.random((1, 100, 2)))
        var1 = jnp.asarray(rng.random((1, 1, 2)))
        var2 = jnp.asarray(rng.random((1, 1, 2)))
        z0_1 = jnp.asarray(rng.random((1, 2)))
        z0_2 = jnp.asarray(rng.random((1, 2)))
        second_t = jnp.linspace(0, 99, 10)

        def loss(first_path_, var1_, var2_):
            first_X = torchcde_tpu.LinearInterpolation(
                torchcde_tpu.linear_interpolation_coeffs(first_path_)
            )
            second_path = torchcde_tpu.cdeint(
                X=first_X, func=_func(var1_), z0=z0_1, t=second_t, adjoint=adjoint,
                method="rk4", options=dict(step_size=10),
            )
            second_X = torchcde_tpu.CubicSpline(
                torchcde_tpu.natural_cubic_coeffs(second_path, second_t), second_t
            )
            third_t = jnp.asarray([0.0, 99.0])
            third_path = torchcde_tpu.cdeint(
                X=second_X, func=_func(var2_), z0=z0_2, t=third_t, adjoint=adjoint,
                method="rk4", options=dict(step_size=10),
            )
            return jnp.sum(third_path[:, -1])

        grads = jax.grad(loss, argnums=(0, 1, 2))(first_path, var1, var2)
        for g in grads:
            g = np.asarray(g)
            assert np.isfinite(g).all()
            assert np.abs(g).sum() > 0


def test_adjoint_matches_direct():
    """For a fixed-step solve the adjoint gradients must match
    differentiate-through-the-solver gradients to solver accuracy."""
    path = jnp.asarray(rng.random((2, 10, 3)))
    variable = jnp.asarray(rng.random((1, 1, 3)))
    z0 = jnp.asarray(rng.random((2, 3)))
    t_out = jnp.asarray([0.0, 9.0])

    def make_loss(adjoint):
        def loss(path_, variable_, z0_):
            spline = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path_))
            z = torchcde_tpu.cdeint(
                X=spline, func=_func(variable_), z0=z0_, t=t_out, adjoint=adjoint,
                method="rk4", options=dict(step_size=0.1),
            )
            return jnp.sum(z[:, -1] ** 2)

        return loss

    # The two gradients agree only up to the solver's own discretisation
    # order (the adjoint solves the continuous adjoint ODE; direct mode
    # differentiates the discrete steps) — empirically O(h^4) for rk4.
    g_adj = jax.grad(make_loss(True), argnums=(0, 1, 2))(path, variable, z0)
    g_dir = jax.grad(make_loss(False), argnums=(0, 1, 2))(path, variable, z0)
    for ga, gd in zip(g_adj, g_dir):
        ga, gd = np.asarray(ga), np.asarray(gd)
        assert np.abs(ga - gd).max() <= 1e-4 * np.abs(gd).max() + 1e-8


def test_detach_trick():
    """Whether t_out requires gradients must not change fixed-step results
    (reference test_detach_trick :111-131): the step index computation uses
    stop_gradient internally."""
    path = jnp.asarray(rng.random((1, 10, 3)))
    interp = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(path))
    variable = jnp.asarray(rng.random((1, 1, 3)))
    z0 = jnp.asarray(rng.random((1, 3)))

    for adjoint in (True, False):
        variable_grads = []
        for t_grad in (True, False):
            def loss(variable_, t_):
                z = torchcde_tpu.cdeint(
                    X=interp, z0=z0, func=_func(variable_), t=t_, adjoint=adjoint,
                    method="rk4", options=dict(step_size=0.5),
                )
                return jnp.sum(z[:, -1])

            t_ = jnp.asarray([0.0, 9.0])
            if t_grad:
                g = jax.grad(loss, argnums=0)(variable, t_)
            else:
                g = jax.grad(lambda v: loss(v, t_))(variable)
            variable_grads.append(np.asarray(g))

        for elem in variable_grads[1:]:
            assert np.array_equal(elem, variable_grads[0])
