"""Multi-device Neural CDE training: data parallel + tensor parallel.

Runs on any mesh: N TPU chips, or a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).
Demonstrates the framework's scaling story — batch sharded across the
``data`` axis, the vector-field MLP width across ``model`` — with the
prefetching native dataloader feeding the device.
"""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import torchcde_tpu  # noqa: F401  (registers pytrees)
from torchcde_tpu.data import CoefficientDataLoader
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
from torchcde_tpu.models.training import make_train_step
from torchcde_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    neural_cde_param_sharding,
)


def get_data(num_timepoints=50, num_samples=512, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4 * math.pi, num_timepoints)
    phase = rng.uniform(0, 2 * math.pi, size=(num_samples, 1))
    y = (rng.random(num_samples) > 0.5).astype(np.float32)
    direction = np.where(y > 0.5, 1.0, -1.0)[:, None]
    x1 = np.cos(direction * t + phase)
    x2 = np.sin(direction * t + phase)
    X = np.stack([np.broadcast_to(t, x1.shape), x1, x2], axis=-1).astype(np.float32)
    return X, y


def main(num_epochs=2, batch_size=None):
    n_dev = len(jax.devices())
    model_axis = 2 if n_dev % 2 == 0 and n_dev >= 4 else 1
    mesh = make_mesh(data=n_dev // model_axis, model=model_axis)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    if batch_size is None:
        batch_size = 16 * (n_dev // model_axis)

    X, y = get_data()
    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=8, output_channels=1, width=128,
        interpolation="cubic", solver="rk4", adjoint=False, step_size=1.0,
    )
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        jax.device_put, params, neural_cde_param_sharding(mesh, params)
    )
    optimizer = optax.adam(1e-3)
    opt_state = jax.tree_util.tree_map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), optimizer.init(params)
    )
    step = jax.jit(make_train_step(cfg, optimizer))
    data_sh = batch_sharding(mesh)

    start = time.time()
    for epoch in range(num_epochs):
        loader = CoefficientDataLoader(
            X, y, batch_size, interpolation="hermite", seed=epoch, device_put=False
        )
        total = 0.0
        for coeffs, labels in loader:
            coeffs = jax.device_put(jnp.asarray(coeffs), data_sh)
            labels = jax.device_put(jnp.asarray(labels), data_sh)
            params, opt_state, loss = step(params, opt_state, coeffs, labels)
            total += float(loss)
        print(f"epoch {epoch}: loss {total / len(loader):.4f}")
    print(f"({time.time() - start:.1f}s, {n_dev} devices)")
    return params


if __name__ == "__main__":
    main()
