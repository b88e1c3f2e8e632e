"""Device-mesh scaling utilities.

The reference has no distributed machinery at all (SURVEY.md section 2:
"Parallelism & distributed-communication inventory") — multi-device scaling
here is green-field and idiomatic JAX: a ``Mesh`` with ``data`` and ``model``
axes, ``NamedSharding`` annotations, and XLA-inserted collectives over ICI.
CDE workloads are batch-independent ODE solves, so data parallelism over the
batch covers every reference workload; the vector-field MLP's inner width can
additionally shard over ``model`` (tensor parallelism) for large hidden sizes.
"""

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data=None, model=1, devices=None):
    """Builds a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data}*{model} != {n} devices")
    device_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(device_array, axis_names=("data", "model"))


def batch_sharding(mesh):
    """Shard the leading batch axis across the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Places a pytree of (batch, ...) arrays with batch split over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def neural_cde_param_sharding(mesh, params):
    """Tensor-parallel layout for the Neural CDE MLP vector field.

    func1 (hidden -> width): shard the width (output) dimension over ``model``.
    func2 (width -> hidden*input): shard the width (input) dimension — the
    contraction over width becomes a reduce-scatter/all-reduce XLA inserts on
    ICI.  Everything else is replicated.
    """

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "func1" in names and "w" in names:
            return NamedSharding(mesh, P(None, "model"))
        if "func1" in names and "b" in names:
            return NamedSharding(mesh, P("model"))
        if "func2" in names and "w" in names:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_params(mesh, params):
    shardings = neural_cde_param_sharding(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
