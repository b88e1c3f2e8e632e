"""Neural RDE via the log-ODE method on long time series.

Capability parity with /root/reference/example/logsignature_example.py:
compress length-5000 spirals into ~100 logsignature steps (depths 1/2/3 give
3/6/14 channels), train a Neural CDE on linear interpolation of the
transformed path, and report accuracy + wall-time per depth.
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


def get_data(num_timepoints=5000, num_samples=64, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4 * math.pi, num_timepoints)
    phase = rng.uniform(0, 2 * math.pi, size=(num_samples, 1))
    y = (rng.random(num_samples) > 0.5).astype(np.float32)
    direction = np.where(y > 0.5, 1.0, -1.0)[:, None]
    radius = 0.5 + t / (4 * math.pi)
    x1 = radius * np.cos(direction * t + phase)
    x2 = radius * np.sin(direction * t + phase)
    X = np.stack([np.broadcast_to(t, x1.shape), x1, x2], axis=-1).astype(np.float32)
    X += 0.01 * rng.standard_normal(X.shape).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


def train_one(depth, window_length, train_X, train_y, test_X, test_y,
              num_epochs=3, lr=0.01, batch_size=32, seed=0):
    start = time.time()
    # The transform is the whole point: length L -> L/window steps of
    # logsignature_channels(c, depth) channels.
    train_logsig = torchcde_tpu.logsig_windows(train_X, depth, window_length)
    test_logsig = torchcde_tpu.logsig_windows(test_X, depth, window_length)
    print(f"depth {depth}: transformed shape {tuple(train_logsig.shape)}")

    cfg = NeuralCDEConfig(
        input_channels=train_logsig.shape[-1], hidden_channels=8, output_channels=1,
        interpolation="linear", solver="rk4", adjoint=False, step_size=1.0,
    )
    train_coeffs = torchcde_tpu.linear_interpolation_coeffs(train_logsig)
    test_coeffs = torchcde_tpu.linear_interpolation_coeffs(test_logsig)

    params = init_neural_cde(jax.random.PRNGKey(seed), cfg)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, optimizer))

    n = train_coeffs.shape[0]
    rng = np.random.default_rng(seed)
    for _epoch in range(num_epochs):
        perm = rng.permutation(n)
        for i in range(max(1, n // batch_size)):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            params, opt_state, _loss = step(
                params, opt_state, train_coeffs[idx], train_y[idx]
            )
    acc = float(accuracy(params, cfg, test_coeffs, test_y))
    elapsed = time.time() - start
    return acc, elapsed


def main(num_timepoints=5000, window_length=50.0, num_epochs=3):
    train_X, train_y = get_data(num_timepoints, seed=0)
    test_X, test_y = get_data(num_timepoints, seed=1)
    results = {}
    for depth in (1, 2, 3):
        acc, elapsed = train_one(
            depth, window_length, train_X, train_y, test_X, test_y, num_epochs
        )
        results[depth] = (acc, elapsed)
        print(f"depth {depth}: accuracy {acc:.3f}, {elapsed:.1f}s")
    return results


if __name__ == "__main__":
    main()
