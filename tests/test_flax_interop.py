"""Flax linen NeuralCDE wrapper: init, apply, jit-train."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import torchcde_tpu as tc
from torchcde_tpu.models.flax_interop import NeuralCDE

rng = np.random.default_rng(29)


def test_flax_neural_cde_trains():
    x = jnp.asarray(rng.standard_normal((8, 15, 3)))
    y = jnp.asarray((rng.random(8) > 0.5).astype(np.float64))
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(x)
    model = NeuralCDE(
        input_channels=3, hidden_channels=4, output_channels=1, width=16,
        solver="rk4", adjoint=False, step_size=1.0,
    )
    params = model.init(jax.random.PRNGKey(0), coeffs)
    out = model.apply(params, coeffs)
    assert out.shape == (8, 1)
    assert np.isfinite(np.asarray(out)).all()

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss(p_):
            logits = model.apply(p_, coeffs)[..., 0]
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(5):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_flax_linear_interpolation_variant():
    x = jnp.asarray(rng.standard_normal((4, 10, 2)))
    coeffs = tc.linear_interpolation_coeffs(x)
    model = NeuralCDE(
        input_channels=2, hidden_channels=3, output_channels=2, width=8,
        interpolation="linear", solver="midpoint", adjoint=False, step_size=1.0,
    )
    params = model.init(jax.random.PRNGKey(1), coeffs)
    out = model.apply(params, coeffs)
    assert out.shape == (4, 2)
