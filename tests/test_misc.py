"""Numeric-kernel unit tests.

Port of the contracts in /root/reference/test/test_misc.py: tridiagonal solve
vs a dense solve, forward_fill vs a triple-loop oracle, cheap_stack vs stack.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchcde_tpu.ops import forward_fill, tridiagonal_solve_pcr, tridiagonal_solve_thomas
from torchcde_tpu.utils import cheap_stack

rng = np.random.default_rng(0)


def test_cheap_stack():
    for num in range(1, 4):
        for dim in (-2, -1, 0, 1):
            xs = [jnp.asarray(rng.random((1, 1))) for _ in range(num)]
            s = cheap_stack(xs, dim)
            s2 = jnp.stack(xs, dim)
            assert s.shape == s2.shape
            assert bool((s == s2).all())


@pytest.mark.parametrize("solver", [tridiagonal_solve_thomas, tridiagonal_solve_pcr])
def test_tridiagonal_solve(solver):
    for trial in range(5):
        size = int(rng.integers(2, 10))
        diagonal = rng.standard_normal(size) + 4.0 * np.sign(rng.standard_normal(size))
        upper = rng.standard_normal(size - 1)
        lower = rng.standard_normal(size - 1)
        A = np.zeros((size, size))
        A[range(size), range(size)] = diagonal
        A[range(1, size), range(size - 1)] = lower
        A[range(size - 1), range(1, size)] = upper
        b = rng.standard_normal(size)
        x = solver(jnp.asarray(b), jnp.asarray(upper), jnp.asarray(diagonal), jnp.asarray(lower))
        assert np.allclose(A @ np.asarray(x), b)


@pytest.mark.parametrize("solver", [tridiagonal_solve_thomas, tridiagonal_solve_pcr])
def test_tridiagonal_solve_batched_broadcast(solver):
    # The reference broadcasts batch dims mutually (misc.py:46-48).
    size = 9
    batch = (4, 3)
    diagonal = rng.standard_normal(batch + (size,)) + 5.0
    upper = rng.standard_normal(size - 1)  # broadcasts against the batched rhs
    lower = rng.standard_normal(batch + (size - 1,))
    b = rng.standard_normal(batch + (size,))
    x = np.asarray(
        solver(jnp.asarray(b), jnp.asarray(upper), jnp.asarray(diagonal), jnp.asarray(lower))
    )
    assert x.shape == batch + (size,)
    for i in range(batch[0]):
        for j in range(batch[1]):
            A = np.zeros((size, size))
            A[range(size), range(size)] = diagonal[i, j]
            A[range(1, size), range(size - 1)] = lower[i, j]
            A[range(size - 1), range(1, size)] = upper
            assert np.allclose(A @ x[i, j], b[i, j], atol=1e-8)


@pytest.mark.parametrize("solver", [tridiagonal_solve_thomas, tridiagonal_solve_pcr])
def test_tridiagonal_solve_long(solver):
    # PCR path must agree with a dense solve for long diagonally-dominant systems.
    size = 300
    diagonal = rng.standard_normal(size) + 6.0
    upper = rng.standard_normal(size - 1)
    lower = rng.standard_normal(size - 1)
    b = rng.standard_normal(size)
    A = np.diag(diagonal) + np.diag(upper, 1) + np.diag(lower, -1)
    expected = np.linalg.solve(A, b)
    x = solver(jnp.asarray(b), jnp.asarray(upper), jnp.asarray(diagonal), jnp.asarray(lower))
    assert np.allclose(np.asarray(x), expected, atol=1e-7)


def test_forward_fill():
    for N, L, C in [(1, 5, 3), (2, 2, 2), (3, 2, 1), (4, 37, 5)]:
        x = rng.standard_normal((N, L, C))
        flat = x.reshape(-1)
        drop = rng.permutation(flat.size)[: int(0.3 * flat.size)]
        flat[drop] = np.nan
        x = flat.reshape(N, L, C)

        expected = x.copy()
        for i in range(N):
            for j in range(L):
                for k in range(C):
                    non_nan = x[i, : j + 1, k][~np.isnan(x[i, : j + 1, k])]
                    expected[i, j, k] = non_nan[-1] if len(non_nan) > 0 else np.nan

        actual = np.asarray(forward_fill(jnp.asarray(x)))
        assert np.allclose(actual, expected, equal_nan=True)
