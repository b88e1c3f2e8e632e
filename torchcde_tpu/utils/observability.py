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


def device_profile(fn, *args, iters=3, warmup=True):
    """Run ``fn(*args)`` under a jax.profiler trace and return a per-op
    accounting of device time and HBM traffic:

        {"device_ms": total device-op ms per iteration,
         "bytes_per_iter": cost-model HBM bytes per iteration,
         "gbps_cost_model": bytes_per_iter / device time,
         "ops": [(name, us_per_iter, mb_per_iter, gbps), ...]  # descending}

    Measurement semantics (v5e, axon tunnel): per-op DURATIONS are measured
    by the device; per-op BYTES are the XLA cost model's ``bytes_accessed``
    (operands + outputs of the compiled op, charged at full logical size).
    TPU hardware DRAM counters are not exposed through the JAX profiler
    (the xplane carries only modeled bytes/flops + measured timings), so an
    op that keeps its working set VMEM-resident across a loop can report
    modeled bytes/time above HBM peak — that excess is the measured VMEM
    saving, not bandwidth.  Callers wanting a true-traffic lower bound
    should divide unique input+output bytes by ``device_ms``.
    """
    import glob
    import gzip
    import json
    import tempfile

    if warmup:
        jax.block_until_ready(fn(*args))
    with tempfile.TemporaryDirectory(prefix="tcde_prof_") as d:
        jax.profiler.start_trace(d)
        try:
            outs = [fn(*args) for _ in range(iters)]
            jax.block_until_ready(outs)
            # the tunnel's block_until_ready is unreliable: force a readback
            float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0])
        finally:
            jax.profiler.stop_trace()
        traces = sorted(glob.glob(os.path.join(
            d, "plugins", "profile", "*", "*.trace.json.gz")))
        if not traces:
            raise RuntimeError("profiler produced no trace")
        with gzip.open(traces[-1], "rt") as f:
            data = json.load(f)

    events = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    # Only the "XLA Ops" line carries per-op events; the "XLA Modules" line
    # is an umbrella over the same wall time (would double-count).
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and e["args"].get("name") == "XLA Ops"}
    per_op = {}
    total_us = 0.0
    total_bytes = 0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = float(e.get("dur", 0.0))
        byt = int(e.get("args", {}).get("bytes_accessed", 0))
        # async copies (cross-program prefetch etc.) re-count bytes the
        # consuming op's bytes_accessed already charges, and their time
        # overlaps compute — keep them in the per-op table, out of totals.
        is_async_copy = e["name"].startswith(("copy-start", "copy-done",
                                              "async-copy"))
        if not is_async_copy:
            total_us += dur
            total_bytes += byt
        us, b = per_op.get(e["name"], (0.0, 0))
        per_op[e["name"]] = (us + dur, b + byt)

    device_ms = total_us / 1e3 / iters
    bytes_per_iter = total_bytes / iters
    ops = sorted(
        ((name, us / iters, b / iters / 1e6,
          (b / 1e9) / (us / 1e6) if us else 0.0)
         for name, (us, b) in per_op.items()),
        key=lambda r: -r[1])
    return {
        "device_ms": device_ms,
        "bytes_per_iter": bytes_per_iter,
        "gbps_cost_model": (bytes_per_iter / 1e9) / (device_ms / 1e3)
        if device_ms else 0.0,
        "ops": ops,
    }


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
