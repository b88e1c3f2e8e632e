"""Pallas tridiagonal kernel: interpret-mode equivalence on any backend.

The compiled kernel itself can only run on TPU hardware (tests_tpu/ covers
that opportunistically, mirroring the reference's opportunistic CUDA gating at
/root/reference/test/test_misc.py:32-34); here the SAME kernel code runs under
the Pallas interpreter so its logic — PCR levels, slab Thomas, padding, the
XLA pre-split for long systems, and the custom VJP — cannot regress silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchcde_tpu.ops.tridiagonal import (
    tridiagonal_solve_pcr,
    tridiagonal_solve_thomas,
)
from torchcde_tpu.ops.tridiagonal_pallas import (
    MAX_KERNEL_LENGTH,
    tridiagonal_solve_pallas,
)

# Interpret-mode Pallas kernels are ~100x slower than compiled; this module
# is part of the slow tier (run the fast core suite with -m 'not slow').
pytestmark = pytest.mark.slow

rng = np.random.default_rng(99)


def _system(shape):
    k = shape[-1]
    u = jnp.asarray(rng.standard_normal(shape[:-1] + (k - 1,)), jnp.float32)
    l = jnp.asarray(rng.standard_normal(shape[:-1] + (k - 1,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    pad = jnp.zeros(shape[:-1] + (1,), jnp.float32)
    # Strictly diagonally dominant, like the cubic-spline fit systems (the
    # kernel, like the reference's pivot-free Thomas at misc.py:58-65, assumes
    # dominance for stability).
    d = 1.0 + jnp.abs(jnp.concatenate([u, pad], -1)) + jnp.abs(
        jnp.concatenate([pad, l], -1)
    )
    return b, u, d, l


@pytest.mark.parametrize(
    "shape",
    [(4, 7), (3, 64), (2, 300), (1, 513), (5, 1024), (2, 2, 130)],
)
def test_interpret_matches_thomas(shape):
    b, u, d, l = _system(shape)
    ref = tridiagonal_solve_thomas(b, u, d, l)
    got = tridiagonal_solve_pallas(b, u, d, l, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_interpret_long_system_presplit():
    # k > MAX_KERNEL_LENGTH exercises the XLA PCR pre-split + batch folding.
    k = 2 * MAX_KERNEL_LENGTH + 37
    b, u, d, l = _system((2, k))
    ref = tridiagonal_solve_thomas(b, u, d, l)
    got = tridiagonal_solve_pallas(b, u, d, l, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_interpret_gradients_match():
    b, u, d, l = _system((2, 40))

    def loss(fn):
        return lambda b, u, d, l: jnp.sum(fn(b, u, d, l) ** 2)

    gp = jax.grad(
        loss(lambda *a: tridiagonal_solve_pallas(*a, interpret=True)), argnums=(0, 1, 2, 3)
    )(b, u, d, l)
    gt = jax.grad(loss(tridiagonal_solve_thomas), argnums=(0, 1, 2, 3))(b, u, d, l)
    for a, c in zip(gp, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-5)


def test_broadcast_semantics_match_reference():
    # Shared bands across a batched rhs (reference misc.py broadcast contract).
    b, u, d, l = _system((6, 33))
    got = tridiagonal_solve_pallas(b, u[0], d[0], l[0], interpret=True)
    ref = tridiagonal_solve_pcr(b, u[0], d[0], l[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def _gappy_system(B, L, frac, seed=11):
    r = np.random.default_rng(seed)
    obs = r.random((B, L)) > frac
    obs[:, 0] = True
    obs[:, -1] = True
    hr = np.where(obs, 0.2 + r.random((B, L)), 0.0).astype(np.float32)
    hr_prev = np.zeros_like(hr)
    for b in range(B):
        prev = 0.0
        for i in range(L):
            if obs[b, i]:
                hr_prev[b, i] = prev
                prev = hr[b, i]
    diag = np.where(obs, 2 * (hr + hr_prev) + 1.0, 1.0).astype(np.float32)
    rhs = np.where(obs, r.standard_normal((B, L)), 0.0).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (diag, rhs, hr, hr_prev)) + (jnp.asarray(obs),)


@pytest.mark.parametrize("shape", [(4, 700, 0.3), (3, 512, 0.0), (2, 1030, 0.6)])
def test_masked_streaming_kernel_matches_scan(shape):
    from torchcde_tpu.interpolation.cubic import _masked_thomas_observed
    from torchcde_tpu.ops.masked_tridiagonal_pallas import masked_thomas_pallas

    d, r, h, hp, o = _gappy_system(*shape)
    ref = _masked_thomas_observed(d, r, h, hp, o)
    got = masked_thomas_pallas(d, r, h, hp, o, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-5)


def test_masked_streaming_kernel_subblock_fold():
    # The TPU default runs the prefix scans over 8-row slices with in-kernel
    # carry folds; interpret tests otherwise take the single-slice shortcut,
    # so pin the fold chaining explicitly against the whole-block scan.
    from torchcde_tpu.ops.masked_tridiagonal_pallas import masked_thomas_pallas

    d, r, h, hp, o = _gappy_system(2, 300, 0.3)
    ref = masked_thomas_pallas(d, r, h, hp, o, interpret=True)
    got = masked_thomas_pallas(d, r, h, hp, o, interpret=True, sub=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-5)


def test_masked_solve_custom_vjp_matches_scan_ad():
    # The analytic VJP (transpose solve + neighbour fills) must equal
    # differentiating through the masked Thomas lax.scan for every CONSISTENT
    # use (hr_prev = previous-observed fill of hr, as the cubic fit always
    # passes): the (j, j+1) coupling gradient is attributed differently
    # between hr_j and hr_prev_{j+1} by the two methods, but their total —
    # the only thing reachable through the fill — is identical.
    from torchcde_tpu.interpolation.cubic import _masked_solve, _masked_thomas_observed
    from torchcde_tpu.ops.fill import masked_fill_scan

    d, r, h, _hp, o = _gappy_system(2, 60, 0.3)
    d, r, h = (v.astype(jnp.float64) for v in (d, r, h))

    def loss(fn):
        def run(d, r, h):
            filled = masked_fill_scan(h, o, axis=-1)
            hp = jnp.concatenate([jnp.zeros_like(h[..., :1]), filled[..., :-1]], -1)
            hp = jnp.where(o, hp, 0.0)
            return jnp.sum(fn(d, r, h, hp, o) ** 3)
        return run

    ga = jax.grad(loss(_masked_solve), argnums=(0, 1, 2))(d, r, h)
    gs = jax.grad(loss(_masked_thomas_observed), argnums=(0, 1, 2))(d, r, h)
    for a, b in zip(ga, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("shape", [(3, 700, 0.4), (2, 512, 0.0), (4, 1030, 0.8)])
def test_streaming_fill_matches_scan(shape, reverse):
    from torchcde_tpu.ops.fill import masked_fill_scan
    from torchcde_tpu.ops.fill_pallas import masked_fill_pallas

    B, L, frac = shape
    r = np.random.default_rng(21)
    v = jnp.asarray(r.standard_normal((B, L)), jnp.float32)
    w = jnp.asarray(r.standard_normal((B, L)), jnp.float32)
    o = jnp.asarray(r.random((B, L)) > frac)
    ref = masked_fill_scan((v, w), o, axis=-1, reverse=reverse)
    got = masked_fill_pallas((v, w), o, reverse=reverse, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("reverse", [False, True])
def test_masked_fill_vjp_matches_scan_ad(reverse):
    from torchcde_tpu.ops.fill import masked_fill, masked_fill_scan

    r = np.random.default_rng(5)
    v = jnp.asarray(r.standard_normal((3, 41)))
    o = jnp.asarray(r.random((3, 41)) > 0.6)

    f1 = lambda v: jnp.sum(masked_fill(v, o, reverse=reverse) ** 3)
    f2 = lambda v: jnp.sum(masked_fill_scan(v, o, axis=-1, reverse=reverse) ** 3)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f1)(v)), np.asarray(jax.grad(f2)(v)), rtol=1e-12
    )


def test_bfloat16_upcast_matches_f32():
    # The shared dtype gate (ops/pallas_dispatch.py) admits bf16 by upcasting
    # kernel operands to f32: the bf16 result must equal the f32 kernel result
    # rounded to bf16, not a natively-bf16 (8-mantissa-bit) solve.
    b, u, d, l = _system((4, 96))
    ref32 = tridiagonal_solve_pallas(b, u, d, l, interpret=True)
    got16 = tridiagonal_solve_pallas(
        b.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
        d.astype(jnp.bfloat16), l.astype(jnp.bfloat16), interpret=True)
    assert got16.dtype == jnp.bfloat16
    # Inputs were rounded to bf16 first, so compare against the f32 solve of
    # the rounded system.
    ref = tridiagonal_solve_pallas(
        b.astype(jnp.bfloat16).astype(jnp.float32),
        u.astype(jnp.bfloat16).astype(jnp.float32),
        d.astype(jnp.bfloat16).astype(jnp.float32),
        l.astype(jnp.bfloat16).astype(jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(got16, np.float32), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)
    err_vs_f32 = np.abs(np.asarray(got16, np.float32) - np.asarray(ref32)).max()
    assert err_vs_f32 < 0.05


def test_bfloat16_streaming_fill_upcast():
    from torchcde_tpu.ops.fill import masked_fill_scan
    from torchcde_tpu.ops.fill_pallas import masked_fill_pallas

    vals = jnp.asarray(rng.standard_normal((4, 600)), jnp.bfloat16)
    obs = jnp.asarray(rng.random((4, 600)) > 0.4)
    got = masked_fill_pallas(vals, obs, interpret=True)
    ref = masked_fill_scan(vals, obs, axis=-1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=1e-2, atol=1e-2)
