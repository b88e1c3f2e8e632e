"""Fused masked natural-cubic fit kernels: interpret-mode equivalence.

The four streaming kernels (ops/masked_cubic_pallas.py) must reproduce the
XLA masked pipeline (interpolation/cubic.py:_masked_coeffs_xla) bit-closely —
same fills, same Thomas sweeps, same re-basing — across NaN patterns,
non-divisible lengths and degenerate rows.  Compiled-on-TPU coverage lives in
tests_tpu/; here the same kernel code runs under the Pallas interpreter so it
cannot regress silently (the pattern of tests/test_pallas.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchcde_tpu.interpolation.cubic import (
    _impute_endpoints,
    _masked_coeffs_xla,
    _natural_cubic_coeffs_masked,
)
from torchcde_tpu.ops.masked_cubic_pallas import (
    masked_natural_cubic_full,
    masked_natural_cubic_pallas,
)

# Interpret-mode Pallas kernels are ~100x slower than compiled; this module
# is part of the slow tier (run the fast core suite with -m 'not slow').
pytestmark = pytest.mark.slow

rng = np.random.default_rng(7)


def _compare(t_np, x_np):
    t = jnp.asarray(t_np, jnp.float32)
    x = jnp.asarray(x_np, jnp.float32)
    ref = _masked_coeffs_xla(t, x)
    got = masked_natural_cubic_pallas(t, x, interpret=True)
    got = tuple(v[..., :-1] for v in got)
    for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )


@pytest.mark.parametrize("shape", [(4, 37), (3, 300), (2, 530), (6, 1025)])
def test_random_nan_patterns(shape):
    # Raw NaN patterns (leading/trailing runs included): both paths must agree
    # on un-imputed data too; the end-to-end test below covers the imputed
    # pipeline.
    x = rng.standard_normal(shape).astype(np.float32)
    x[rng.random(shape) < 0.3] = np.nan
    t = np.cumsum(0.5 + rng.random(shape[-1])).astype(np.float32)
    _compare(t, x)


def test_degenerate_rows():
    # Fully observed, all-NaN, single-observation and two-observation rows.
    L = 70
    x = rng.standard_normal((5, L)).astype(np.float32)
    x[1] = np.nan
    x[2, :] = np.nan
    x[2, 31] = 1.5
    x[3, :] = np.nan
    x[3, 10] = -1.0
    x[3, 50] = 2.0
    x[4, ::7] = np.nan
    t = np.arange(L, dtype=np.float32)
    _compare(t, x)


def test_multi_batch_dims():
    x = rng.standard_normal((2, 3, 4, 65)).astype(np.float32)
    x[rng.random(x.shape) < 0.25] = np.nan
    t = np.arange(65, dtype=np.float32)
    _compare(t, x)


def test_matches_full_masked_pipeline():
    # End-to-end: the dispatching entry point (XLA path on CPU) against the
    # fused kernels on the same post-imputation data.
    L = 120
    x = rng.standard_normal((8, L)).astype(np.float32)
    x[rng.random(x.shape) < 0.2] = np.nan
    t = np.arange(L, dtype=np.float32)
    ref = _natural_cubic_coeffs_masked(jnp.asarray(t), jnp.asarray(x), _version=1)

    # Reproduce the version-1 imputation, then run the fused kernels.
    xi = np.asarray(x, dtype=np.float32).copy()
    for row in xi:
        obs = np.flatnonzero(~np.isnan(row))
        if obs.size:
            row[: obs[0]] = row[obs[0]]
            row[obs[-1] + 1 :] = row[obs[-1]]
    got = masked_natural_cubic_pallas(
        jnp.asarray(t, jnp.float32), jnp.asarray(xi), interpret=True
    )
    got = tuple(v[..., :-1] for v in got)
    any_obs = ~np.all(np.isnan(x), axis=-1, keepdims=True)
    for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
        g = np.where(any_obs, np.asarray(g), 0.0)
        np.testing.assert_allclose(
            g, np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )


# --------------------------------------------------------------------------
# Batch-major full path: raw values in, in-kernel imputation, batch-major
# coefficients out (masked_natural_cubic_full) — must match XLA imputation
# followed by the XLA masked fit for both endpoint-imputation versions.
# --------------------------------------------------------------------------


def _compare_full(t_np, x_np, version):
    t = jnp.asarray(t_np, jnp.float32)
    x = jnp.asarray(x_np, jnp.float32)
    ref = _masked_coeffs_xla(t, _impute_endpoints(x, version))
    got = masked_natural_cubic_full(t, x, version, interpret=True)
    got = tuple(v[..., :-1] for v in got)
    # Rows with no observation at all produce garbage on both paths; the
    # dispatching caller masks them with its any-observation predicate.
    any_obs = ~np.all(np.isnan(np.asarray(x_np)), axis=-1, keepdims=True)
    for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
        g = np.where(any_obs, np.asarray(g), 0.0)
        r = np.where(any_obs, np.asarray(r), 0.0)
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4,
                                   err_msg=f"v{version} {name}")


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("shape", [(4, 37), (3, 300), (2, 530)])
def test_full_random_nan_patterns(version, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    x[rng.random(shape) < 0.3] = np.nan
    x[:, shape[-1] // 2] = rng.standard_normal(shape[0])  # >=1 obs per row
    t = np.cumsum(0.5 + rng.random(shape[-1])).astype(np.float32)
    _compare_full(t, x, version)


@pytest.mark.parametrize("version", [0, 1])
def test_full_leading_trailing_runs(version):
    # Long leading/trailing NaN runs exercise the in-kernel imputation, and
    # multi-dim batches exercise the flatten/restore path.
    x = rng.standard_normal((2, 3, 130)).astype(np.float32)
    x[..., :41] = np.nan
    x[..., -37:] = np.nan
    x[rng.random(x.shape) < 0.2] = np.nan
    x[..., 65] = rng.standard_normal((2, 3))
    t = np.arange(130, dtype=np.float32)
    _compare_full(t, x, version)


def test_full_degenerate_rows():
    L = 70
    x = rng.standard_normal((5, L)).astype(np.float32)
    x[1, :] = np.nan  # all-NaN row (masked by the caller on both paths)
    x[2, :] = np.nan
    x[2, 31] = 1.5  # single observation
    x[3, :] = np.nan
    x[3, 10] = -1.0
    x[3, 50] = 2.0  # two observations
    x[4, ::7] = np.nan
    t = np.arange(L, dtype=np.float32)
    _compare_full(t, x, 1)


def test_full_matches_dispatching_entry():
    # End-to-end: _natural_cubic_coeffs_masked (XLA path on CPU) against the
    # batch-major fused path on the same raw data, both versions.
    L = 120
    x = rng.standard_normal((8, L)).astype(np.float32)
    x[rng.random(x.shape) < 0.2] = np.nan
    t = np.arange(L, dtype=np.float32)
    any_obs = ~np.all(np.isnan(x), axis=-1, keepdims=True)
    for version in (0, 1):
        ref = _natural_cubic_coeffs_masked(
            jnp.asarray(t), jnp.asarray(x), _version=version)
        got = masked_natural_cubic_full(
            jnp.asarray(t, jnp.float32), jnp.asarray(x), version,
            interpret=True)
        got = tuple(v[..., :-1] for v in got)
        for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
            g = np.where(any_obs, np.asarray(g), 0.0)
            np.testing.assert_allclose(
                g, np.asarray(r), rtol=2e-4, atol=2e-4,
                err_msg=f"v{version} {name}")


# --------------------------------------------------------------------------
# VMEM-resident single-launch path (ops/masked_cubic_resident.py): the
# default natural_cubic_coeffs route on TPU when the time axis fits VMEM —
# same contract as masked_natural_cubic_full, 5 HBM passes instead of 31.
# Interpret mode runs the same four-phase kernel body under the Pallas
# interpreter (wb=8, one sub-slice per 128-row slice).
# --------------------------------------------------------------------------


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("shape", [(4, 37), (3, 300)])
def test_resident_random_nan_patterns(version, shape):
    from torchcde_tpu.ops.masked_cubic_resident import (
        masked_natural_cubic_resident,
    )

    x = rng.standard_normal(shape).astype(np.float32)
    x[rng.random(shape) < 0.3] = np.nan
    x[:, shape[-1] // 2] = rng.standard_normal(shape[0])  # >=1 obs per row
    t = np.cumsum(0.5 + rng.random(shape[-1])).astype(np.float32)
    tj, xj = jnp.asarray(t), jnp.asarray(x)
    ref = _masked_coeffs_xla(tj, _impute_endpoints(xj, version))
    got = masked_natural_cubic_resident(tj, xj, version, interpret=True)
    got = tuple(v[..., :-1] for v in got)
    for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"v{version} {name}")


def test_resident_degenerate_rows_and_multislice():
    # Degenerate observation counts plus a length spanning several 128-row
    # resident slices (the fori_loop carry chaining across slices).
    from torchcde_tpu.ops.masked_cubic_resident import (
        masked_natural_cubic_resident,
    )

    L = 300
    x = rng.standard_normal((5, L)).astype(np.float32)
    x[1, :] = np.nan
    x[1, 31] = 1.5  # single observation
    x[2, :] = np.nan
    x[2, 10] = -1.0
    x[2, 250] = 2.0  # two observations spanning slices
    x[3, ::7] = np.nan
    x[4, :100] = np.nan
    x[4, -120:] = np.nan
    t = np.arange(L, dtype=np.float32)
    tj, xj = jnp.asarray(t), jnp.asarray(x)
    ref = _masked_coeffs_xla(tj, _impute_endpoints(xj, 1))
    got = masked_natural_cubic_resident(tj, xj, 1, interpret=True)
    got = tuple(v[..., :-1] for v in got)
    for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_full_subblock_fold_matches_whole_block():
    # The TPU default runs K1/K2's prefix scans over 8-row slices with
    # in-kernel carry folds; interpret tests otherwise take the single-slice
    # shortcut, so pin the fold chaining explicitly against the whole-block
    # scan at a block size small enough for interpret mode.
    L = 120
    x = rng.standard_normal((4, L)).astype(np.float32)
    x[rng.random(x.shape) < 0.3] = np.nan
    x[:, L // 2] = rng.standard_normal(4)
    t = np.cumsum(0.5 + rng.random(L)).astype(np.float32)
    for version in (0, 1):
        ref = masked_natural_cubic_full(
            jnp.asarray(t), jnp.asarray(x), version, interpret=True, kb=32)
        got = masked_natural_cubic_full(
            jnp.asarray(t), jnp.asarray(x), version, interpret=True, kb=32,
            sub=8)
        for name, r, g in zip(("a", "b", "two_c", "three_d"), ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4,
                err_msg=f"v{version} {name}")
