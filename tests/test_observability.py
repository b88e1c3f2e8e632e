"""Solver statistics and checkpoint utilities."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import torchcde_tpu as tc
from torchcde_tpu.utils import load_checkpoint, save_checkpoint

rng = np.random.default_rng(17)


def _make_problem():
    x = jnp.asarray(rng.standard_normal((2, 10, 3)))
    X = tc.CubicSpline(tc.natural_cubic_coeffs(x))
    f = lambda t, z: jnp.tanh(z)[..., None] * jnp.ones((2, 4, 3))
    z0 = jnp.asarray(rng.standard_normal((2, 4)))
    return X, f, z0


def test_return_stats_fixed():
    X, f, z0 = _make_problem()
    out, stats = tc.cdeint(
        X, f, z0, X.interval, adjoint=False, method="rk4",
        options=dict(step_size=1.0), return_stats=True,
    )
    assert int(stats["steps_attempted"]) == 9
    assert int(stats["steps_accepted"]) == 9
    assert int(stats["nfe"]) == 9 * 4


def test_return_stats_adaptive():
    X, f, z0 = _make_problem()
    out, stats = tc.cdeint(
        X, f, z0, X.interval, adjoint=False, method="dopri5", return_stats=True
    )
    assert int(stats["steps_accepted"]) >= 1
    assert int(stats["steps_attempted"]) >= int(stats["steps_accepted"])
    # FSAL dopri5: 6 evaluations per attempted step + 1 init + 2 for the
    # initial-step-size heuristic.
    assert int(stats["nfe"]) == 3 + 6 * int(stats["steps_attempted"])


def test_checkpoint_roundtrip():
    tree = {
        "coeffs": jnp.asarray(rng.standard_normal((3, 9, 12))),
        "params": {"w": jnp.asarray(rng.standard_normal((4, 4)))},
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, tree)
        restored = load_checkpoint(path, jax.tree_util.tree_map(jnp.zeros_like, tree))
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b))
