"""Linear interpolation contract tests.

Port of /root/reference/test/test_linear_interpolation.py: knot reproduction
on linear data with NaN drops, the length-2 case, specification + derivative
vs autodiff, and rectilinear preparation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu
from torchcde_tpu.ops import forward_fill

rng = np.random.default_rng(1)


def _points():
    yield 2
    yield 3
    yield 100
    for _ in range(5):
        yield int(rng.integers(2, 100))


def test_random():
    for drop in (False, True):
        for use_t in (False, True):
            for num_points in _points():
                if use_t:
                    start, end = sorted(rng.random(2) * 10 - 5)
                    t = np.linspace(start, end, num_points)
                    t_ = jnp.asarray(t)
                else:
                    t = np.linspace(0, num_points - 1, num_points)
                    t_ = None
                num_channels = int(rng.integers(1, 5))
                m = rng.random(num_channels) * 10 - 5
                c = rng.random(num_channels) * 10 - 5
                values = m * t[:, None] + c

                values_clone = values.copy()
                if drop:
                    for ch in range(num_channels):
                        num_drop = int(num_points * rng.integers(1, 4) / 10)
                        num_drop = min(num_drop, num_points - 4)
                        to_drop = rng.permutation(num_points - 2)[:num_drop] + 1
                        values_clone[to_drop, ch] = np.nan

                coeffs = torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(values_clone), t=t_)
                linear = torchcde_tpu.LinearInterpolation(coeffs, t=t_)

                # jit once per spline: scalar-time evaluation stays the
                # per-point contract of the reference test, but each probe is
                # one cached executable instead of ~10 eager dispatches.
                ev_fn = jax.jit(linear.evaluate)
                dv_fn = jax.jit(linear.derivative)
                for time, value in zip(t, values):
                    ev = np.asarray(ev_fn(jnp.asarray(time)))
                    assert value.shape == ev.shape
                    assert np.allclose(value, ev, rtol=1e-4, atol=1e-6)
                    dv = np.asarray(dv_fn(jnp.asarray(time)))
                    assert m.shape == dv.shape
                    assert np.allclose(m, dv, rtol=1e-4, atol=1e-6)


def test_small():
    for use_t in (False, True):
        if use_t:
            start, end = sorted(rng.random(2) * 10 - 5)
            t = np.array([start, end])
            t_ = jnp.asarray(t)
        else:
            start, end = 0.0, 1.0
            t = np.array([0.0, 1.0])
            t_ = None
        x = rng.random((2, 1))
        true_deriv = (x[1] - x[0]) / (end - start)
        coeffs = torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x), t=t_)
        linear = torchcde_tpu.LinearInterpolation(coeffs, t=t_)
        ev_fn = jax.jit(linear.evaluate)
        dv_fn = jax.jit(linear.derivative)
        for time in np.linspace(-1, 2, 20):
            true = x[0] + true_deriv * (time - t[0])
            pred = np.asarray(ev_fn(jnp.asarray(time)))
            deriv = np.asarray(dv_fn(jnp.asarray(time)))
            assert true_deriv.shape == deriv.shape
            assert np.allclose(true_deriv, deriv)
            assert true.shape == pred.shape
            assert np.allclose(true, pred)


def test_specification_and_derivative():
    for use_t in (False, True):
        for _ in range(3):
            for num_batch_dims in (0, 1, 2, 3):
                batch_dims = [int(rng.integers(1, 3)) for _ in range(num_batch_dims)]
                length = int(rng.integers(5, 10))
                channels = int(rng.integers(1, 5))
                if use_t:
                    t = np.linspace(0, 1, length)
                    t_ = jnp.asarray(t)
                else:
                    t = np.linspace(0, length - 1, length)
                    t_ = None
                x = rng.random((*batch_dims, length, channels))
                coeffs = torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x), t=t_)
                spline = torchcde_tpu.LinearInterpolation(coeffs, t=t_)
                ev_fn = jax.jit(spline.evaluate)
                dv_fn = jax.jit(spline.derivative)
                # Specification: the interpolant passes through the knots.
                for i, point in enumerate(t):
                    ev = np.asarray(ev_fn(jnp.asarray(point)))
                    assert np.allclose(ev, x[..., i, :], atol=1e-5, rtol=1e-5)
                # derivative(t) must equal d/dt evaluate(t) by autodiff.
                eval_flat = lambda p: spline.evaluate(p).reshape(-1)
                jac_fn = jax.jit(jax.jacfwd(eval_flat))
                for point in rng.random(10):
                    point = jnp.asarray(point)
                    derivative = np.asarray(dv_fn(point)).reshape(-1)
                    autoderivative = np.asarray(jac_fn(point))
                    assert derivative.shape == autoderivative.shape
                    assert np.allclose(derivative, autoderivative, atol=1e-5, rtol=1e-5)


def test_rectilinear_preparation():
    nan = np.nan
    # Variable-length, NaN-padded pair of series with a time channel.
    x1 = np.array([[0.1, 0.4], [0.2, nan], [0.9, 1.1]])
    x2 = np.array([[0.2, nan], [0.3, 2.0], [nan, nan]])
    x = np.stack([x1, x2])
    # Times must be NaN-free: forward fill the padded tail.
    x[..., 0] = np.asarray(forward_fill(jnp.asarray(x[..., 0]), fill_index=-1))

    x1_true = np.array([[0.1, 0.2, 0.2, 0.9, 0.9], [0.4, 0.4, 0.4, 0.4, 1.1]]).T
    x2_true = np.array([[0.2, 0.3, 0.3, 0.3, 0.3], [2.0, 2.0, 2.0, 2.0, 2.0]]).T
    rect_true = np.stack([x1_true, x2_true])

    rectilinear = np.asarray(torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0))
    mask = ~np.isnan(rect_true)
    assert np.array_equal(rect_true[mask], rectilinear[mask])

    # Swapped time channel position.
    x_swap = x[:, :, [1, 0]]
    rect_swap = np.asarray(
        torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x_swap), rectilinear=1)
    )
    assert np.array_equal(rect_true[:, :, [1, 0]], rect_swap)

    # 2-D case.
    rect_2d = np.asarray(torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x[0]), rectilinear=0))
    assert np.array_equal(rect_true[0], rect_2d)
    # 4-D case.
    x_4d = np.stack([x, x])
    rect_4d = np.asarray(torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x_4d), rectilinear=0))
    assert np.array_equal(np.stack([rect_true, rect_true]), rect_4d)

    # NaN times must raise.
    x_time_nan = x.copy()
    x_time_nan[0, 1, 0] = nan
    with pytest.raises(ValueError):
        torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x_time_nan), rectilinear=0)


def test_rectilinear_random():
    nan = np.nan
    for _ in range(3):
        t_starts = rng.standard_normal(5) ** 2
        ts = [np.linspace(s, s + 10, int(rng.integers(2, 50))) for s in t_starts]
        xs = [rng.standard_normal((len(t), 9)) for t in ts]
        max_len = max(len(t) for t in ts)
        rows = []
        for t_, x_ in zip(ts, xs):
            row = np.concatenate([t_[:, None], x_], axis=1)
            pad = np.full((max_len - len(t_), 10), nan)
            rows.append(np.concatenate([row, pad], axis=0))
        x = np.stack(rows)
        mask = rng.integers(0, 5, size=(x.shape[0], x.shape[1], x.shape[2] - 1)).astype(float)
        mask[mask == 0] = nan
        x[:, :, 1:] = x[:, :, 1:] * np.where(np.isnan(mask), nan, 1.0)
        x[..., 0] = np.asarray(forward_fill(jnp.asarray(x[..., 0]), fill_index=-1))

        x_ffilled = np.asarray(forward_fill(jnp.asarray(x)))
        N, L, C = x_ffilled.shape
        rect_true = np.zeros((N, 2 * L - 1, C))
        lag = np.concatenate([x_ffilled[:, 1:, :1], x_ffilled[:, :-1, 1:]], axis=-1)
        rect_true[:, ::2] = x_ffilled
        rect_true[:, 1::2] = lag

        rectilinear = np.asarray(
            torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
        )
        m = ~np.isnan(rect_true)
        assert np.array_equal(rect_true[m], rectilinear[m])
