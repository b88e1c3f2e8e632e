"""Natural cubic spline contract tests.

Ports the contracts of /root/reference/test/test_natural_cubic_spline.py
(linear-data reproduction, the length-2 case, specification + derivative vs
autodiff) and adds a NaN-path oracle test: the batched masked kernel must
match a straightforward per-scalar NumPy re-implementation of the reference
algorithm (interpolation_cubic.py:78-167).
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchcde_tpu

rng = np.random.default_rng(2)

INTERP_FNS = (torchcde_tpu.natural_cubic_coeffs, torchcde_tpu.natural_cubic_spline_coeffs)


def _test_equal_controls(num_channels, obj1, obj2, start, end, tol):
    for dimension in (0, 1, 2):
        sizes = tuple(int(rng.integers(1, 4)) for _ in range(dimension))
        expected_size = sizes + (num_channels,)
        eval_times = jnp.asarray(rng.random(sizes) * (end - start) + start)
        e1 = np.asarray(jax.jit(obj1.evaluate)(eval_times))
        e2 = np.asarray(jax.jit(obj2.evaluate)(eval_times))
        d1 = np.asarray(jax.jit(obj1.derivative)(eval_times))
        d2 = np.asarray(jax.jit(obj2.derivative)(eval_times))
        assert e1.shape == expected_size
        assert e2.shape == expected_size
        assert d1.shape == expected_size
        assert d2.shape == expected_size
        assert np.allclose(e1, e2, rtol=tol, atol=tol)
        assert np.allclose(d1, d2, rtol=tol, atol=tol)


def test_linear():
    # On exactly-linear data the cubic spline must agree with the linear
    # interpolant everywhere (reference test_linear :106-128).
    for interp_fn in INTERP_FNS:
        for use_t in (False, True):
            start, end = sorted(rng.random(2) * 5 - 2.5)
            num_points = int(rng.integers(2, 10))
            num_channels = int(rng.integers(1, 4))
            m = rng.random(num_channels) * 5 - 2.5
            c = rng.random(num_channels) * 5 - 2.5
            if use_t:
                t = np.linspace(start, end, num_points)
                t_ = jnp.asarray(t)
            else:
                t = np.linspace(0, num_points - 1, num_points)
                t_ = None
            values = jnp.asarray(m * t[:, None] + c)
            coeffs = interp_fn(values, t_)
            spline = torchcde_tpu.CubicSpline(coeffs, t_)
            coeffs2 = torchcde_tpu.linear_interpolation_coeffs(values, t_)
            linear = torchcde_tpu.LinearInterpolation(coeffs2, t_)
            _test_equal_controls(num_channels, linear, spline, -1.5, 1.5, 1e-4)


def test_short():
    for interp_fn in INTERP_FNS:
        for use_t in (False, True):
            t = jnp.asarray([0.0, 1.0]) if use_t else None
            values = jnp.asarray(rng.random((2, 1)))
            coeffs = interp_fn(values, t)
            spline = torchcde_tpu.CubicSpline(coeffs, t)
            coeffs2 = torchcde_tpu.linear_interpolation_coeffs(values, t)
            linear = torchcde_tpu.LinearInterpolation(coeffs2, t)
            _test_equal_controls(1, linear, spline, -1.5, 1.5, 1e-4)


def test_specification_and_derivative():
    for interp_fn in INTERP_FNS:
        for _ in range(2):
            for use_t in (False, True):
                for num_batch_dims in (0, 1, 3):
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
                    coeffs = interp_fn(jnp.asarray(x), t_)
                    spline = torchcde_tpu.CubicSpline(coeffs, t_)
                    ev_fn = jax.jit(spline.evaluate)
                    dv_fn = jax.jit(spline.derivative)
                    for i, point in enumerate(t):
                        ev = np.asarray(ev_fn(jnp.asarray(point)))
                        assert np.allclose(ev, x[..., i, :], atol=1e-5, rtol=1e-5)
                    eval_flat = lambda p: spline.evaluate(p).reshape(-1)
                    jac_fn = jax.jit(jax.jacfwd(eval_flat))
                    for point in rng.random(5):
                        point = jnp.asarray(point)
                        derivative = np.asarray(dv_fn(point)).reshape(-1)
                        autoderivative = np.asarray(jac_fn(point))
                        assert derivative.shape == autoderivative.shape
                        assert np.allclose(derivative, autoderivative, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# NaN-path oracle: per-scalar NumPy re-implementation of the reference
# algorithm, used to validate the batched masked kernel.
# ---------------------------------------------------------------------------


def _oracle_dense(t, x):
    """Natural spline coefficients on fully-observed scalar data (NumPy)."""
    length = len(x)
    if length == 2:
        a = x[:1]
        b = (x[1:] - x[:1]) / (t[1:] - t[:1])
        return a, b, np.zeros(1), np.zeros(1)
    h = np.diff(t)
    hr = 1 / h
    pds = 3 * np.diff(x) * hr**2
    diag = np.zeros(length)
    diag[:-1] = hr
    diag[1:] += hr
    diag *= 2
    rhs = np.zeros(length)
    rhs[:-1] = pds
    rhs[1:] += pds
    A = np.diag(diag) + np.diag(hr, 1) + np.diag(hr, -1)
    kd = np.linalg.solve(A, rhs)
    six_pd = 6 * np.diff(x)
    a = x[:-1]
    b = kd[:-1]
    two_c = (six_pd * hr - 4 * kd[:-1] - 2 * kd[1:]) * hr
    three_d = (-six_pd * hr + 3 * (kd[:-1] + kd[1:])) * hr**2
    return a, b, two_c, three_d


def _oracle_masked_scalar(t, x, version):
    """Reference missing-values algorithm (interpolation_cubic.py:78-167)."""
    x = x.copy()
    not_nan = ~np.isnan(x)
    if not not_nan.any():
        z = np.zeros(len(x) - 1)
        return z, z, z, z
    obs_idx = np.nonzero(not_nan)[0]
    if version == 0:
        if np.isnan(x[0]):
            x[0] = x[obs_idx[0]]
        if np.isnan(x[-1]):
            x[-1] = x[obs_idx[-1]]
    else:
        x[: obs_idx[0]] = x[obs_idx[0]]
        x[obs_idx[-1] + 1 :] = x[obs_idx[-1]]
    not_nan = ~np.isnan(x)
    tn = t[not_nan]
    xn = x[not_nan]
    a0, b0, c0, d0 = _oracle_dense(tn, xn)

    a_out, b_out, c_out, d_out = [], [], [], []
    j = -1
    for time in t[:-1]:
        # Mirrors the two-iterator walk at interpolation_cubic.py:147-162:
        # observed times are a subset of grid times, so at most one advance
        # happens per grid position.
        if time >= tn[j + 1]:
            j += 1
        offset = tn[j] - time
        ai, bi, ci, di = a0[j], b0[j], c0[j], d0[j]
        a_out.append(ai + ((0.5 * ci - di * offset / 3) * offset - bi) * offset)
        b_out.append(bi + (di * offset - ci) * offset)
        c_out.append(ci - 2 * di * offset)
        d_out.append(di)
    return map(np.asarray, (a_out, b_out, c_out, d_out))


def test_masked_kernel_vs_oracle():
    for version, interp_fn in ((1, torchcde_tpu.natural_cubic_coeffs),
                               (0, torchcde_tpu.natural_cubic_spline_coeffs)):
        for trial in range(4):
            length = int(rng.integers(5, 20))
            channels = int(rng.integers(1, 4))
            batch = int(rng.integers(1, 4))
            t = np.sort(rng.random(length) * 10)
            t += 0.05 * np.arange(length)  # ensure strictly increasing
            x = rng.standard_normal((batch, length, channels))
            # Random interior drops; keep first/last observed in some channels,
            # NaN at the edges in others, and one all-NaN channel sometimes.
            drop = rng.random((batch, length, channels)) < 0.35
            x = np.where(drop, np.nan, x)
            if trial == 0:
                x[0, :, 0] = np.nan  # all-NaN channel
            # Guarantee at least one observation in the remaining channels.
            for bi in range(batch):
                for ci in range(channels):
                    if (bi, ci) == (0, 0) and trial == 0:
                        continue
                    if np.isnan(x[bi, :, ci]).all():
                        x[bi, rng.integers(0, length), ci] = rng.standard_normal()

            coeffs = np.asarray(interp_fn(jnp.asarray(x), jnp.asarray(t)))
            a, b, two_c, three_d = np.split(coeffs, 4, axis=-1)
            for bi in range(batch):
                for ci in range(channels):
                    ao, bo, co, do = _oracle_masked_scalar(t, x[bi, :, ci], version)
                    assert np.allclose(a[bi, :, ci], ao, atol=1e-8), (version, trial, bi, ci)
                    assert np.allclose(b[bi, :, ci], bo, atol=1e-8)
                    assert np.allclose(two_c[bi, :, ci], co, atol=1e-8)
                    assert np.allclose(three_d[bi, :, ci], do, atol=1e-8)


def test_reproduces_analytic_natural_cubic():
    """Property the reference's flaky analytic fuzz aimed at
    (/root/reference/test/test_natural_cubic_spline.py:7-103, skipped
    upstream): fitting samples of a genuine natural cubic spline reproduces
    it.  The oracle here is the classical MOMENT formulation — solve the
    moment (second-derivative) tridiagonal system with dense f64 LAPACK and
    evaluate the textbook piecewise formula — sharing no code path with the
    package's coefficient algebra.  Non-flaky: exact in f64 up to roundoff.
    """
    r = np.random.default_rng(7)
    for t in (np.linspace(0.0, 9.0, 10), np.sort(r.uniform(0.0, 5.0, 8))):
        n = len(t)
        y = r.standard_normal((3, n, 2))
        h = np.diff(t)

        # Moment equations: natural BCs M_0 = M_{n-1} = 0.
        A = np.zeros((n, n))
        rhs = np.zeros((n,) + y.shape[:1] + y.shape[2:])
        A[0, 0] = A[-1, -1] = 1.0
        for i in range(1, n - 1):
            A[i, i - 1] = h[i - 1] / 6
            A[i, i] = (h[i - 1] + h[i]) / 3
            A[i, i + 1] = h[i] / 6
            rhs[i] = (y[:, i + 1] - y[:, i]) / h[i] - (y[:, i] - y[:, i - 1]) / h[i - 1]
        M = np.linalg.solve(A, rhs.reshape(n, -1)).reshape(rhs.shape)

        def oracle(tq):
            i = min(np.searchsorted(t, tq, side="right") - 1, n - 2)
            i = max(i, 0)
            hi = h[i]
            u, w = t[i + 1] - tq, tq - t[i]
            Mi, Mj = M[i], M[i + 1]
            yi, yj = y[:, i], y[:, i + 1]
            val = (Mi * u**3 + Mj * w**3) / (6 * hi) \
                + (yi / hi - Mi * hi / 6) * u + (yj / hi - Mj * hi / 6) * w
            der = (-Mi * u**2 + Mj * w**2) / (2 * hi) \
                - (yi / hi - Mi * hi / 6) + (yj / hi - Mj * hi / 6)
            return val, der

        spline = torchcde_tpu.CubicSpline(
            torchcde_tpu.natural_cubic_coeffs(jnp.asarray(y), t=jnp.asarray(t)),
            t=jnp.asarray(t),
        )
        ev_fn = jax.jit(spline.evaluate)
        dv_fn = jax.jit(spline.derivative)
        for tq in r.uniform(t[0], t[-1], 12):
            val, der = oracle(float(tq))
            np.testing.assert_allclose(np.asarray(ev_fn(jnp.asarray(tq))), val,
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(dv_fn(jnp.asarray(tq))), der,
                                       atol=1e-9)
