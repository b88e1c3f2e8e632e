"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed machinery (SURVEY.md section 2); these tests
cover the green-field mesh scaling: data-parallel batch sharding and
tensor-parallel vector-field sharding must produce the same numerics as
single-device execution, with XLA inserting the collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import torchcde_tpu as tc
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
from torchcde_tpu.models.training import make_train_step
from torchcde_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    neural_cde_param_sharding,
    shard_batch,
)

rng = np.random.default_rng(13)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _setup(batch=16):
    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=4, output_channels=1, width=16,
        interpolation="cubic", solver="rk4", adjoint=False, step_size=1.0,
    )
    x = rng.standard_normal((batch, 12, 3))
    y = (rng.random(batch) > 0.5).astype(np.float64)
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(jnp.asarray(x))
    params = init_neural_cde(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    return cfg, coeffs, jnp.asarray(y), params


def _run_steps(cfg, params, coeffs, y, n=2):
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, optimizer))
    for _ in range(n):
        params, opt_state, loss = step(params, opt_state, coeffs, y)
    return params, float(loss)


def test_data_parallel_matches_single_device():
    cfg, coeffs, y, params = _setup()
    params_ref, loss_ref = _run_steps(cfg, params, coeffs, y)

    mesh = make_mesh(data=8, model=1)
    coeffs_s = shard_batch(mesh, coeffs)
    y_s = jax.device_put(y, batch_sharding(mesh))
    params_s = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P())), params
    )
    params_dp, loss_dp = _run_steps(cfg, params_s, coeffs_s, y_s)

    assert np.isclose(loss_ref, loss_dp, rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(params_ref), jax.tree_util.tree_leaves(params_dp)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_tensor_parallel_matches_single_device():
    cfg, coeffs, y, params = _setup()
    params_ref, loss_ref = _run_steps(cfg, params, coeffs, y)

    mesh = make_mesh(data=4, model=2)
    shardings = neural_cde_param_sharding(mesh, params)
    params_s = jax.tree_util.tree_map(jax.device_put, params, shardings)
    coeffs_s = shard_batch(mesh, coeffs)
    y_s = jax.device_put(y, batch_sharding(mesh))
    params_tp, loss_tp = _run_steps(cfg, params_s, coeffs_s, y_s)

    assert np.isclose(loss_ref, loss_tp, rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(params_ref), jax.tree_util.tree_leaves(params_tp)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_sharded_coefficient_construction():
    """Coefficient preprocessing (the L2 layer) shards over batch too."""
    mesh = make_mesh(data=8, model=1)
    x = rng.standard_normal((32, 20, 3))
    x[rng.random(x.shape) < 0.2] = np.nan
    ref = np.asarray(tc.natural_cubic_coeffs(jnp.asarray(x)))

    x_s = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    out = jax.jit(tc.natural_cubic_coeffs)(x_s)
    assert np.allclose(np.asarray(out), ref, atol=1e-10)
