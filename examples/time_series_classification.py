"""Spiral-chirality classification with a Neural CDE — the canonical workload.

Capability parity with /root/reference/example/time_series_classification.py:
clockwise vs counter-clockwise spirals, time as channel 0, Hermite cubic
coefficients precomputed offline as the dataset, Adam + BCE-with-logits, and
test accuracy reported.  The whole train step is jitted; on TPU the batch can
be sharded across a mesh (see torchcde_tpu.parallel).
"""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import torchcde_tpu
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
from torchcde_tpu.models.training import accuracy, make_train_step


def get_data(num_timepoints=100, num_samples=128, seed=0):
    """Clockwise/counter-clockwise spirals; time is data channel 0."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4 * math.pi, num_timepoints)
    phase = rng.uniform(0, 2 * math.pi, size=(num_samples, 1))
    y = (rng.random(num_samples) > 0.5).astype(np.float32)  # chirality label
    direction = np.where(y > 0.5, 1.0, -1.0)[:, None]
    radius = 0.5 + t / (4 * math.pi)
    x1 = radius * np.cos(direction * t + phase)
    x2 = radius * np.sin(direction * t + phase)
    X = np.stack(
        [np.broadcast_to(t, x1.shape), x1, x2], axis=-1
    ).astype(np.float32)
    X = X + 0.01 * rng.standard_normal(X.shape).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


def main(num_epochs=10, batch_size=32, hidden_channels=8, lr=1e-3, seed=0):
    train_X, train_y = get_data(num_samples=128, seed=seed)
    test_X, test_y = get_data(num_samples=128, seed=seed + 1)

    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=hidden_channels, output_channels=1,
        interpolation="cubic", solver="dopri5", adjoint=True,
    )

    # Offline preprocessing — coefficients are the dataset (the reference's
    # save/dataload pattern, time_series_classification.py:142-149).
    train_coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(train_X)
    test_coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(test_X)

    params = init_neural_cde(jax.random.PRNGKey(seed), cfg)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    train_step = jax.jit(make_train_step(cfg, optimizer))

    n = train_coeffs.shape[0]
    steps_per_epoch = max(1, n // batch_size)
    rng = np.random.default_rng(seed)
    start = time.time()
    for epoch in range(num_epochs):
        perm = rng.permutation(n)
        epoch_loss = 0.0
        for i in range(steps_per_epoch):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            params, opt_state, loss = train_step(
                params, opt_state, train_coeffs[idx], train_y[idx]
            )
            epoch_loss += float(loss)
        print(f"Epoch: {epoch}   Training loss: {epoch_loss / steps_per_epoch:.4f}")
    elapsed = time.time() - start

    acc = float(accuracy(params, cfg, test_coeffs, test_y))
    print(f"Test Accuracy: {acc:.4f}   ({elapsed:.1f}s train)")
    return acc


if __name__ == "__main__":
    main()
