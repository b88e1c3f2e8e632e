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


def param_sharding_rules(mesh, params, rules, default=P()):
    """Rule-based tensor-parallel layout for ANY parameter pytree.

    ``rules`` is a sequence of ``(pattern, PartitionSpec)`` pairs; each leaf's
    path is rendered as a '/'-joined key string ("func1/w", "mlp/layers/0/
    kernel", ...) and matched with ``fnmatch`` globs — first match wins,
    unmatched leaves get ``default`` (replicated).  This replaces nothing in
    the reference (it has no distributed machinery, SURVEY.md section 2); it
    is the user-facing hook for sharding a custom vector field.
    """
    import fnmatch

    def spec_for(path, leaf):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
            for p in path
        )
        for pattern, spec in rules:
            if fnmatch.fnmatch(key, pattern):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, default)

    return jax.tree_util.tree_map_with_path(spec_for, params)


# Tensor-parallel rules for the built-in Neural CDE MLP vector field: func1
# (hidden -> width) shards the width (output) dimension over ``model``; func2
# (width -> hidden*input) shards the width (input) dimension, so XLA turns
# the contraction over width into a reduce-scatter/all-reduce on ICI.
NEURAL_CDE_TP_RULES = (
    ("*func1/w", P(None, "model")),
    ("*func1/b", P("model")),
    ("*func2/w", P("model", None)),
)


def neural_cde_param_sharding(mesh, params, rules=NEURAL_CDE_TP_RULES):
    """Tensor-parallel layout for the built-in Neural CDE MLP vector field
    (or any pytree, by passing custom ``rules`` — see param_sharding_rules)."""
    return param_sharding_rules(mesh, params, rules)


def place_params(mesh, params, rules=NEURAL_CDE_TP_RULES):
    shardings = param_sharding_rules(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
