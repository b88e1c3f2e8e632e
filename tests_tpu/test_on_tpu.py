"""Opportunistic on-hardware TPU tests (run OUTSIDE tests/, whose conftest
pins everything to a CPU mesh): `python -m pytest tests_tpu/ -q`.

Skips entirely unless the default backend is a real TPU — the analogue of the
reference's opportunistic CUDA gating (/root/reference/test/test_misc.py:32-34).
Covers the compiled Pallas kernel and the method="auto" TPU dispatch, which
the CPU suite can only reach in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU hardware"
)

rng = np.random.default_rng(7)


def _system(shape):
    k = shape[-1]
    u = jnp.asarray(rng.standard_normal(shape[:-1] + (k - 1,)), jnp.float32)
    l = jnp.asarray(rng.standard_normal(shape[:-1] + (k - 1,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    pad = jnp.zeros(shape[:-1] + (1,), jnp.float32)
    d = 1.0 + jnp.abs(jnp.concatenate([u, pad], -1)) + jnp.abs(
        jnp.concatenate([pad, l], -1)
    )
    return b, u, d, l


@pytest.mark.parametrize("k", [64, 513, 1024, 2048, 4096])
def test_pallas_kernel_matches_scan_on_tpu(k):
    from torchcde_tpu.ops.tridiagonal import tridiagonal_solve_thomas
    from torchcde_tpu.ops.tridiagonal_pallas import tridiagonal_solve_pallas

    b, u, d, l = _system((256, k))
    ref = tridiagonal_solve_thomas(b, u, d, l)
    got = tridiagonal_solve_pallas(b, u, d, l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_auto_dispatch_picks_pallas_and_is_correct():
    from torchcde_tpu.ops.tridiagonal import tridiagonal_solve, tridiagonal_solve_thomas

    b, u, d, l = _system((2048, 512))
    got = tridiagonal_solve(b, u, d, l, method="auto")
    ref = tridiagonal_solve_thomas(b, u, d, l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_pallas_gradients_on_tpu():
    from torchcde_tpu.ops.tridiagonal import tridiagonal_solve_thomas
    from torchcde_tpu.ops.tridiagonal_pallas import tridiagonal_solve_pallas

    b, u, d, l = _system((1024, 128))

    def loss(fn):
        return lambda b, u, d, l: jnp.sum(fn(b, u, d, l) ** 2)

    gp = jax.jit(jax.grad(loss(tridiagonal_solve_pallas), argnums=(0, 1, 2, 3)))(b, u, d, l)
    gt = jax.jit(jax.grad(loss(tridiagonal_solve_thomas), argnums=(0, 1, 2, 3)))(b, u, d, l)
    for a, c in zip(gp, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-2, atol=1e-2)


def test_cubic_fit_on_tpu_smoke():
    # End-to-end: the natural-cubic NaN pipeline on hardware (auto dispatch
    # inside picks the pallas path for large batches).
    import torchcde_tpu as tc

    x = rng.standard_normal((1024, 64, 3)).astype(np.float32)
    x[rng.random(x.shape) < 0.1] = np.nan
    x[:, 0, 0] = 1.0
    coeffs = tc.natural_cubic_coeffs(jnp.asarray(x))
    spline = tc.CubicSpline(coeffs)
    out = spline.evaluate(jnp.asarray(3.7))
    assert bool(jnp.all(jnp.isfinite(out)))
