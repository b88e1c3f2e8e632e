"""Solver front-end contract tests.

Port of /root/reference/test/test_cdeint.py: output shapes across batch dims /
channels / methods / backends, backend equivalence at fixed step, tuple state
with zero-grad isolation, and the func.prod fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu

rng = np.random.default_rng(4)


@pytest.mark.parametrize(
    "backend, method, kwargs",
    (
        ("torchdiffeq", "rk4", {"options": {"step_size": 1.0}}),
        ("torchdiffeq", "dopri5", {}),
        ("torchsde", "midpoint", {"dt": 1.0}),
        ("native", "reversible_heun", {"step_size": 1.0}),
    ),
)
def test_shape(backend, method, kwargs):
    for _ in range(3):
        num_points = int(rng.integers(5, 50))
        num_channels = int(rng.integers(1, 3))
        num_hidden_channels = int(rng.integers(1, 5))
        num_batch_dims = int(rng.integers(0, 3))
        batch_dims = tuple(int(rng.integers(1, 3)) for _ in range(num_batch_dims))

        values = jnp.asarray(rng.random((*batch_dims, num_points, num_channels)))
        coeffs = torchcde_tpu.natural_cubic_coeffs(values)
        spline = torchcde_tpu.CubicSpline(coeffs)

        variable = jnp.asarray(
            rng.random((*(1 for _ in range(num_batch_dims)), 1, num_channels))
        )

        def f(t, z):
            return jax.nn.sigmoid(z)[..., None] + variable

        z0 = jnp.asarray(rng.random((*batch_dims, num_hidden_channels)))
        num_out_times = int(rng.integers(2, 8))
        start, end = np.asarray(spline.interval)
        out_times = jnp.asarray(np.sort(rng.random(num_out_times)) * (end - start) + start)

        out = torchcde_tpu.cdeint(
            spline, f, z0, out_times, backend=backend, method=method,
            rtol=1e-1, atol=1e-1, adjoint=False, **kwargs,
        )
        assert out.shape == (*batch_dims, num_out_times, num_hidden_channels)


def test_backend():
    # torchdiffeq-midpoint and torchsde-midpoint must agree exactly: the
    # diffusion is identically zero (reference test_cdeint.py:49-63).
    x = jnp.asarray(rng.standard_normal((1, 10, 2)))
    coeffs = torchcde_tpu.natural_cubic_coeffs(x)
    X = torchcde_tpu.CubicSpline(coeffs)

    def func(t, z):
        return jnp.broadcast_to(-z[..., None], (1, 3, 2))

    z0 = jnp.asarray(rng.standard_normal((1, 3)))

    out_d = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=X.interval, backend="torchdiffeq",
        method="midpoint", options=dict(step_size=1.0), adjoint=False,
    )
    out_s = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=X.interval, backend="torchsde",
        method="midpoint", dt=1.0, adjoint=False,
    )
    assert np.allclose(np.asarray(out_d), np.asarray(out_s))

    # Both aliases dispatch to the same native stepper, so the API check
    # above cannot fail on numerics.  The real cross-solver equivalence
    # contract (the reference compared two genuinely different libraries):
    # two different discretisations must converge to the same solution.
    out_rk4 = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=X.interval, method="rk4",
        options=dict(step_size=0.01), adjoint=False,
    )
    out_dopri = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=X.interval, method="dopri5",
        rtol=1e-8, atol=1e-10, adjoint=False,
    )
    np.testing.assert_allclose(np.asarray(out_rk4), np.asarray(out_dopri),
                               rtol=1e-5, atol=1e-7)


def test_tuple_input():
    xa = jnp.asarray(rng.random((2, 10, 2)))
    xb = jnp.asarray(rng.random((10, 1)))

    coeffs_a = torchcde_tpu.natural_cubic_coeffs(xa)
    coeffs_b = torchcde_tpu.natural_cubic_coeffs(xb)
    spline_a = torchcde_tpu.CubicSpline(coeffs_a)
    spline_b = torchcde_tpu.CubicSpline(coeffs_b)
    X = torchcde_tpu.TupleControl(spline_a, spline_b)

    def func(t, z):
        za, zb = z
        return (
            jnp.repeat(jax.nn.sigmoid(za)[..., None], 2, axis=-1),
            jnp.tanh(zb)[..., None],
        )

    z0_a = jnp.asarray(rng.random((2, 3)))
    z0_b = jnp.asarray(rng.random(5))

    def loss(z0_b_):
        out = torchcde_tpu.cdeint(X=X, func=func, z0=(z0_a, z0_b_), t=X.interval)
        return jnp.sum(out[0])

    grad_b = jax.grad(loss)(z0_b)
    # The first tuple member's output must be independent of the second's
    # initial state (reference test_tuple_input :66-83).
    assert np.all(np.asarray(grad_b) == 0)


def test_prod():
    x = jnp.asarray(rng.random((2, 5, 1)))
    X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(x))

    class F:
        def prod(self, t, z, dXdt):
            assert jnp.shape(t) == ()
            assert z.shape == (2, 3)
            assert dXdt.shape == (2, 1)
            return -z * dXdt

    z0 = jnp.asarray(rng.random((2, 3)))

    def loss(z0_):
        out = torchcde_tpu.cdeint(X=X, func=F(), z0=z0_, t=X.interval)
        return jnp.sum(out)

    g = jax.grad(loss)(z0)
    assert np.isfinite(np.asarray(g)).all()


def test_malformed_inputs():
    x = jnp.asarray(rng.random((1, 10, 2)))
    X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(x))
    z0 = jnp.asarray(rng.random((1, 3)))

    with pytest.raises(ValueError):
        # wrong hidden channel count in the returned system
        torchcde_tpu.cdeint(
            X=X, func=lambda t, z: jnp.zeros((1, 4, 2)), z0=z0, t=X.interval, adjoint=False
        )
    with pytest.raises(ValueError):
        # wrong input channel count
        torchcde_tpu.cdeint(
            X=X, func=lambda t, z: jnp.zeros((1, 3, 5)), z0=z0, t=X.interval, adjoint=False
        )
    with pytest.raises(ValueError):
        # no derivative method
        torchcde_tpu.cdeint(
            X=object(), func=lambda t, z: jnp.zeros((1, 3, 2)), z0=z0, t=X.interval,
            adjoint=False,
        )


def test_torchsde_method_aliases():
    # torchsde solver names whose zero-diffusion discretisation is exactly
    # Euler (the CDE reduction always has g = 0, reference solver.py:140-141)
    # are accepted and match the native euler step.
    x = jnp.asarray(rng.standard_normal((1, 10, 2)))
    X = torchcde_tpu.CubicSpline(torchcde_tpu.natural_cubic_coeffs(x))

    def func(t, z):
        return jnp.broadcast_to(jnp.tanh(z)[..., None], (1, 3, 2))

    z0 = jnp.asarray(rng.standard_normal((1, 3)))
    ref = torchcde_tpu.cdeint(X=X, func=func, z0=z0, t=X.interval,
                              backend="torchsde", method="euler", dt=1.0,
                              adjoint=False)
    for name in ("milstein", "euler_heun"):
        out = torchcde_tpu.cdeint(X=X, func=func, z0=z0, t=X.interval,
                                  backend="torchsde", method=name, dt=1.0,
                                  adjoint=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
