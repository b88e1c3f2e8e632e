"""Native host runtime (C++/ctypes) vs JAX kernel equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu as tc
from torchcde_tpu import native
from torchcde_tpu.interpolation.linear import _fill_missing_linear
from torchcde_tpu.ops.fill import forward_fill as jax_forward_fill
from torchcde_tpu.ops.logsignature import lyndon_words as jax_lyndon
from torchcde_tpu.ops.tridiagonal import tridiagonal_solve_thomas

rng = np.random.default_rng(11)

pytestmark = pytest.mark.skipif(not native.available(), reason="libcdehost not built")


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_thomas(dtype):
    b = rng.standard_normal((32, 50)).astype(dtype)
    d = (rng.standard_normal((32, 50)) + 5.0).astype(dtype)
    u = rng.standard_normal((32, 49)).astype(dtype)
    l = rng.standard_normal((32, 49)).astype(dtype)
    x = native.thomas_solve(b, u, d, l)
    xr = np.asarray(
        tridiagonal_solve_thomas(jnp.asarray(b), jnp.asarray(u), jnp.asarray(d), jnp.asarray(l))
    )
    assert np.allclose(x, xr, atol=1e-4 if dtype == np.float32 else 1e-10)


def test_forward_fill():
    x = rng.standard_normal((4, 20, 3))
    x[rng.random(x.shape) < 0.3] = np.nan
    ours = native.forward_fill(x)
    ref = np.asarray(jax_forward_fill(jnp.asarray(x)))
    assert np.allclose(ours, ref, equal_nan=True)


def test_linear_infill():
    x = rng.standard_normal((4, 20, 3))
    x[rng.random(x.shape) < 0.3] = np.nan
    x[1, :, 2] = np.nan  # all-NaN channel
    t = np.sort(rng.random(20)) * 7 + 0.01 * np.arange(20)
    ours = native.linear_infill(t, x)
    ref = np.asarray(_fill_missing_linear(jnp.asarray(t), jnp.asarray(x)))
    assert np.allclose(ours, ref, atol=1e-12)


def test_coefficient_kernels():
    x = rng.standard_normal((4, 20, 3))
    t = np.sort(rng.random(20)) * 7 + 0.01 * np.arange(20)
    assert np.allclose(
        native.natural_cubic_dense(t, x),
        np.asarray(tc.natural_cubic_coeffs(jnp.asarray(x), jnp.asarray(t))),
        atol=1e-9,
    )
    assert np.allclose(
        native.hermite_coeffs(t, x),
        np.asarray(
            tc.hermite_cubic_coefficients_with_backward_differences(
                jnp.asarray(x), jnp.asarray(t)
            )
        ),
        atol=1e-9,
    )


def test_lyndon():
    for c in (2, 3, 4):
        for d in (1, 2, 3):
            assert native.lyndon_words(c, d) == jax_lyndon(c, d)


def test_end_to_end_native_preprocessing():
    """Native coeffs feed the JAX model directly (the data-loader pattern)."""
    x = rng.standard_normal((8, 30, 3)).astype(np.float32)
    t = np.arange(30, dtype=np.float32)
    coeffs = native.hermite_coeffs(t, x)
    X = tc.CubicSpline(jnp.asarray(coeffs), jnp.asarray(t))
    out = tc.cdeint(
        X,
        lambda tt, z: jnp.tanh(z)[..., None] * jnp.ones((8, 2, 3), jnp.float32),
        jnp.zeros((8, 2), jnp.float32),
        X.interval,
        adjoint=False,
        method="rk4",
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_natural_cubic_masked(dtype):
    # The masked C++ kernel must match the JAX masked pipeline
    # (interpolation/cubic.py _version=1) on NaN-heavy data, including an
    # all-NaN channel and leading/trailing gaps.
    x = rng.standard_normal((6, 24, 3)).astype(dtype)
    x[rng.random(x.shape) < 0.35] = np.nan
    x[1, :, 2] = np.nan           # all-NaN channel
    x[2, :5, 0] = np.nan          # leading gap
    x[3, -6:, 1] = np.nan         # trailing gap
    t = np.sort(rng.random(24).astype(dtype)) * 5 + dtype(0.01) * np.arange(24, dtype=dtype)
    ours = native.natural_cubic_masked(t, x)
    ref = np.asarray(tc.natural_cubic_coeffs(jnp.asarray(x), jnp.asarray(t)))
    atol = 1e-3 if dtype == np.float32 else 1e-9
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=atol), np.abs(ours - ref).max()


def test_natural_cubic_masked_dense_agrees():
    # With no NaNs the masked kernel must reduce to the dense one.
    x = rng.standard_normal((4, 16, 2))
    t = np.arange(16, dtype=np.float64)
    ours = native.natural_cubic_masked(t, x)
    dense = native.natural_cubic_dense(t, x)
    assert np.allclose(ours, dense, atol=1e-12)


@pytest.mark.parametrize("dtype,tol", [(np.float64, 1e-12), (np.float32, 1e-4)])
def test_logsig_window_values_match_jax(dtype, tol):
    # The C++ windowed logsignature (Chen product of segment exponentials,
    # tensor log, Lyndon gather) vs ops/logsignature.py — the host twin that
    # replaces the reference's per-window signatory calls (log_ode.py:57-67).
    from torchcde_tpu.ops.logsignature import windowed_logsignatures

    x = rng.standard_normal((4, 50, 3)).astype(dtype)
    b = np.asarray([0, 7, 20, 31, 49], np.int64)
    for depth in (1, 2, 3):
        ref = np.asarray(windowed_logsignatures(jnp.asarray(x), depth, b))
        got = native.logsig_window_values(x, b, depth)
        assert got.shape == ref.shape
        assert np.allclose(got, ref, atol=tol, rtol=tol), (
            depth, np.abs(got - ref).max())


def test_logsig_windows_host_matches_logsig_windows():
    # Full host pipeline (merge grid, NaN-row insertion, linear infill,
    # windows, X(t0) row, cumsum) == torchcde_tpu.logsig_windows (v1),
    # including NaNs and an irregular grid.
    x = rng.standard_normal((3, 40, 3))
    x[rng.random(x.shape) < 0.2] = np.nan
    t = np.sort(rng.random(40)) * 11 + 0.01 * np.arange(40)
    ref = np.asarray(tc.logsig_windows(jnp.asarray(x), 3, 2.5, jnp.asarray(t)))
    got = native.logsig_windows_host(t, x, 3, 2.5)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-9), np.abs(got - ref).max()


def test_loader_logsig_interpolation():
    # CoefficientDataLoader(interpolation="logsig") yields the windowed
    # logsignature path per batch without touching JAX in workers.
    from torchcde_tpu.data import CoefficientDataLoader

    x = rng.standard_normal((10, 30, 3)).astype(np.float64)
    y = rng.standard_normal(10)
    loader = CoefficientDataLoader(
        x, y, batch_size=5, interpolation="logsig", depth=3, window_length=4.0,
        shuffle=False, device_put=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    ref = np.asarray(tc.logsig_windows(jnp.asarray(x[:5]), 3, 4.0))
    assert np.allclose(np.asarray(batches[0][0]), ref, atol=1e-9)
    with pytest.raises(ValueError, match="depth= and window_length="):
        CoefficientDataLoader(x, y, batch_size=5, interpolation="logsig")
