"""Profiling and checkpointing utilities.

The reference has no tracing/profiling or checkpoint machinery of its own
(SURVEY.md section 5) — its observability is two warnings and the examples'
prints; its checkpoint story is "coefficients are plain tensors".  Here:

* ``trace(...)``: a jax.profiler trace context for capturing TPU profiles of
  the solve/training loops.
* solver statistics come from ``cdeint(..., return_stats=True)`` (step/NFE
  counters — what torchdiffeq tracks internally but never exposes).
* checkpointing: controls and model parameters are pytrees of plain arrays,
  so ``save_checkpoint``/``load_checkpoint`` (orbax if available, npz
  otherwise) cover coefficients, parameters, and optimizer state alike —
  the functional analogue of the reference's buffers-ride-state_dict design
  (interpolation_cubic.py:300-305).
"""

import contextlib
import os

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir, *, create_perfetto_link=False):
    """Profile a block: ``with trace('/tmp/profile'): train_step(...)``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region for profile timelines (device + host)."""
    return jax.profiler.TraceAnnotation(name)


def save_checkpoint(path, tree):
    """Saves any pytree of arrays (params, opt state, coefficients)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        return "orbax"
    except Exception:
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            *[np.asarray(leaf) for leaf in leaves],
        )
        return "npz"


def load_checkpoint(path, like):
    """Restores a pytree saved by ``save_checkpoint``; ``like`` provides the
    tree structure (and dtypes for the npz fallback)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), item=like)
        return restored
    except Exception:
        npz_path = path if path.endswith(".npz") else path + ".npz"
        data = np.load(npz_path)
        leaves, treedef = jax.tree_util.tree_flatten(like)
        new_leaves = [data[f"arr_{i}"] for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
