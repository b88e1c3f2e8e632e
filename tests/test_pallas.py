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
