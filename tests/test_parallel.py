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


@pytest.mark.parametrize("method", ["spike", "pcr"])
def test_seq_sharded_tridiagonal_matches_single_device(method):
    """Length axis sharded over the mesh: both the substructuring (SPIKE)
    and the distributed-PCR formulations == local Thomas."""
    from torchcde_tpu.ops.tridiagonal import tridiagonal_solve_thomas
    from torchcde_tpu.parallel.seq_pcr import tridiagonal_solve_seq_sharded

    mesh = make_mesh(data=1, model=8)
    for k in (48, 129, 1024):
        u = jnp.asarray(rng.standard_normal((4, k - 1)))
        l = jnp.asarray(rng.standard_normal((4, k - 1)))
        b = jnp.asarray(rng.standard_normal((4, k)))
        pad = jnp.zeros((4, 1))
        d = 1.0 + jnp.abs(jnp.concatenate([u, pad], -1)) + jnp.abs(
            jnp.concatenate([pad, l], -1)
        )
        ref = tridiagonal_solve_thomas(b, u, d, l)
        got = tridiagonal_solve_seq_sharded(b, u, d, l, mesh, axis="model",
                                            method=method)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9)


def test_seq_and_batch_sharded_tridiagonal():
    """Batch over 'data' AND length over 'model' simultaneously (the
    BASELINE config-3 layout: shard both axes of the cubic-fit solve)."""
    from torchcde_tpu.ops.tridiagonal import tridiagonal_solve_thomas
    from torchcde_tpu.parallel.seq_pcr import tridiagonal_solve_seq_sharded

    mesh = make_mesh(data=4, model=2)
    k = 256
    u = jnp.asarray(rng.standard_normal((8, k - 1)))
    l = jnp.asarray(rng.standard_normal((8, k - 1)))
    b = jnp.asarray(rng.standard_normal((8, k)))
    pad = jnp.zeros((8, 1))
    d = 1.0 + jnp.abs(jnp.concatenate([u, pad], -1)) + jnp.abs(
        jnp.concatenate([pad, l], -1)
    )
    ref = tridiagonal_solve_thomas(b, u, d, l)
    got = tridiagonal_solve_seq_sharded(
        b, u, d, l, mesh, axis="model", batch_axis="data"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9)


def test_tensor_parallel_custom_vector_field_rules():
    """TP sharding of a user-defined vector field whose parameter pytree has
    nothing named func1/func2 — via param_sharding_rules globs."""
    from torchcde_tpu.parallel.mesh import param_sharding_rules

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    params = {
        "lift": {"kernel": jax.random.normal(k1, (4, 32)), "bias": jnp.zeros(32)},
        "proj": {"kernel": jax.random.normal(k2, (32, 4 * 3)) / 32.0},
    }
    x = rng.standard_normal((16, 12, 3))
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(jnp.asarray(x))

    def field(p):
        def f(t, z):
            h = jnp.tanh(z @ p["lift"]["kernel"] + p["lift"]["bias"])
            return (h @ p["proj"]["kernel"]).reshape(z.shape[0], 4, 3)
        return f

    def loss(p, coeffs):
        X = tc.CubicSpline(coeffs)
        z0 = jnp.zeros((16, 4))
        out = tc.cdeint(X, field(p), z0, X.interval, adjoint=False,
                        method="rk4", options=dict(step_size=1.0))
        return jnp.sum(out[:, -1] ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, coeffs)

    mesh = make_mesh(data=4, model=2)
    rules = (
        ("lift/kernel", P(None, "model")),
        ("lift/bias", P("model")),
        ("proj/kernel", P("model", None)),
    )
    shardings = param_sharding_rules(mesh, params, rules)
    # the rules actually hit: lift/kernel is sharded over model, not replicated
    assert shardings["lift"]["kernel"].spec == P(None, "model")
    params_s = jax.tree_util.tree_map(jax.device_put, params, shardings)
    coeffs_s = shard_batch(mesh, coeffs)
    g_tp = jax.jit(jax.grad(loss))(params_s, coeffs_s)
    for a, b in zip(jax.tree_util.tree_leaves(g_tp), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("adjoint", [False, True])
def test_data_parallel_reversible_heun_matches_single_device(adjoint):
    """BASELINE config 5 names a v5p-8 mesh for the reversible-Heun backend:
    the DP-sharded train step (direct backprop AND the O(1) inverse-map
    adjoint, reversible_adjoint.py) must match single-device numerics."""
    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=4, output_channels=1, width=16,
        interpolation="cubic", solver="reversible_heun", adjoint=adjoint,
        step_size=1.0,
    )
    x = rng.standard_normal((16, 12, 3))
    y = (rng.random(16) > 0.5).astype(np.float64)
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x))
    params = init_neural_cde(jax.random.PRNGKey(5), cfg, dtype=jnp.float64)
    params_ref, loss_ref = _run_steps(cfg, params, coeffs, jnp.asarray(y))

    mesh = make_mesh(data=8, model=1)
    coeffs_s = shard_batch(mesh, coeffs)
    y_s = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    params_s = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P())), params
    )
    params_dp, loss_dp = _run_steps(cfg, params_s, coeffs_s, y_s)

    assert np.isclose(loss_ref, loss_dp, rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                    jax.tree_util.tree_leaves(params_dp)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_data_parallel_per_sample_solve_matches_single_device():
    """Per-sample adaptive stepping under batch sharding: each lane runs its
    own dopri5 controller, the batch axis lives across the mesh, and values +
    parameter gradients match the single-device per-sample solve."""
    key = jax.random.PRNGKey(7)
    w = jax.random.normal(key, (4, 4 * 3), dtype=jnp.float64) * 0.3
    x = rng.standard_normal((16, 12, 3))
    # magnitude spread -> genuinely different per-lane step sequences
    x *= (10.0 ** np.linspace(-0.5, 0.5, 16))[:, None, None]
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x))
    z0 = jnp.asarray(rng.standard_normal((16, 4)))

    def loss(w_, coeffs_, z0_):
        X = tc.CubicSpline(coeffs_)

        def f(t, z):
            # per-sample slicing vmaps the field over lanes: z may arrive
            # batched (B, H) or per-lane (H,)
            return jnp.tanh(z @ w_).reshape(z.shape[:-1] + (4, 3))

        out = tc.cdeint(X, f, z0_, X.interval, adjoint=False,
                        method="dopri5", rtol=1e-6, atol=1e-8,
                        options=dict(per_sample=True))
        return jnp.sum(out[:, -1] ** 2)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss))(w, coeffs, z0)

    mesh = make_mesh(data=8, model=1)
    coeffs_s = shard_batch(mesh, coeffs)
    z0_s = jax.device_put(z0, batch_sharding(mesh))
    w_s = jax.device_put(w, NamedSharding(mesh, P()))
    l_dp, g_dp = jax.jit(jax.value_and_grad(loss))(w_s, coeffs_s, z0_s)

    assert np.isclose(float(l_ref), float(l_dp), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_seq_sharded_masked_cubic_fit_matches_single_device():
    # VERDICT r2 item 4: the NaN-masked natural-cubic fit with the LENGTH
    # axis across the mesh must match the single-device masked pipeline.
    from torchcde_tpu.parallel.seq_masked import natural_cubic_coeffs_seq_sharded

    x = rng.standard_normal((4, 64, 3))
    x[rng.random(x.shape) < 0.35] = np.nan
    x[1, :, 2] = np.nan       # all-NaN channel
    x[2, :10, 0] = np.nan     # leading gap
    x[3, -12:, 1] = np.nan    # trailing gap
    x[0, 8:40, 0] = np.nan    # a gap spanning multiple shards
    t = np.sort(rng.random(64)) * 9 + 0.01 * np.arange(64)
    xj = jnp.asarray(x)
    tj = jnp.asarray(t)

    ref = tc.natural_cubic_coeffs(xj, tj)

    mesh = make_mesh(data=1, model=8)
    got = natural_cubic_coeffs_seq_sharded(xj, tj, mesh, axis="model")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-8)


def test_seq_sharded_masked_cubic_fit_one_shard_shortcut():
    # Round 5: a 1-shard mesh provides no parallelism to amortise SPIKE's
    # 3x local solves, so the sharded entry point degrades to the
    # single-device masked fit — bit-identical, eager and under jit.
    import jax
    from jax.sharding import Mesh
    from torchcde_tpu.parallel.seq_masked import natural_cubic_coeffs_seq_sharded

    x = rng.standard_normal((4, 48, 2))
    x[rng.random(x.shape) < 0.25] = np.nan
    xj = jnp.asarray(x)
    ref = tc.natural_cubic_coeffs(xj)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    got = natural_cubic_coeffs_seq_sharded(xj, None, mesh, axis="model")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    got_j = jax.jit(
        lambda a: natural_cubic_coeffs_seq_sharded(a, None, mesh, axis="model")
    )(xj)
    np.testing.assert_allclose(np.asarray(got_j), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_seq_sharded_masked_cubic_fit_with_batch_sharding():
    from torchcde_tpu.parallel.seq_masked import natural_cubic_coeffs_seq_sharded

    x = rng.standard_normal((8, 32, 2))
    x[rng.random(x.shape) < 0.25] = np.nan
    xj = jnp.asarray(x)
    ref = tc.natural_cubic_coeffs(xj)

    mesh = make_mesh(data=2, model=4)
    got = natural_cubic_coeffs_seq_sharded(xj, None, mesh, axis="model",
                                           batch_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_seq_sharded_masked_cubic_fit_differentiable():
    # The sharded fit's contract is 'same as natural_cubic_coeffs', which is
    # a differentiable op: reverse-mode AD must flow through the shard_map
    # (fills, gappy SPIKE solve, re-basing) and match the single-device
    # gradient.  Pins the dispatchers used per-shard to the differentiable
    # custom_vjp wrappers, not raw pallas_calls.
    from torchcde_tpu.parallel.seq_masked import natural_cubic_coeffs_seq_sharded

    x = rng.standard_normal((2, 64, 2))
    x[rng.random(x.shape) < 0.3] = np.nan
    t = np.arange(64, dtype=np.float64)
    xj = jnp.asarray(x)
    tj = jnp.asarray(t)
    mesh = make_mesh(data=1, model=8)

    g_sharded = jax.grad(
        lambda v: jnp.sum(natural_cubic_coeffs_seq_sharded(v, tj, mesh,
                                                           axis="model") ** 2)
    )(xj)
    g_local = jax.grad(
        lambda v: jnp.sum(tc.natural_cubic_coeffs(v, tj) ** 2)
    )(xj)
    mask = ~np.isnan(x)
    np.testing.assert_allclose(np.asarray(g_sharded)[mask],
                               np.asarray(g_local)[mask],
                               rtol=1e-7, atol=1e-8)
