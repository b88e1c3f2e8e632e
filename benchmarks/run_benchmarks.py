"""Benchmark harness for the five BASELINE.json configs.

The reference publishes no numbers (BASELINE.md) so this harness creates the
baseline record:

1. spiral      — spiral Neural CDE train step (hermite + dopri5 adjoint,
                 batch 256, length 100)
2. irregular   — linear/rectilinear coefficient construction on irregular,
                 variable-length, NaN-masked data
3. cubic_fit   — natural cubic spline fit at batch 8192 x length 4096 with
                 NaN masks (batched tridiagonal stress); reports GB/s
4. log_ode     — depth-3 logsignature windows on length-10k series
                 (preprocessing), plus log_ode_train: the Neural RDE
                 TRAINING step over those windows (linear interpolation +
                 dopri5 adjoint, the reference example's configuration)
5. rev_heun    — reversible-Heun backend train step at large batch, and on an
                 n-device mesh when more than one device is present

Run: python benchmarks/run_benchmarks.py [names...]   (defaults to all)
Prints one JSON line per benchmark.
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import roofline  # noqa: E402  (benchmarks/roofline.py)

# Set by the timing helpers: (xla cost dict for the whole timed program,
# iterations that program covers).  ``_annotate`` folds it into a result.
_LAST_COST = (None, 1)


def _annotate(result, t_seconds, attainable_tflops=None):
    cost, per_iter = _LAST_COST
    return roofline.annotate(result, t_seconds, cost, per_iter=per_iter,
                             attainable_tflops=attainable_tflops)


def _mlp_attainable_tflops(H, C, W):
    """Thin-operand attainable MXU rate for the MLP-field stage/VJP op mix
    (benchmarks/traffic_model.py) on the current chip, or None."""
    import traffic_model

    peaks = roofline._peak_for(roofline.chip_kind())
    if peaks is None:
        return None
    model = traffic_model.flagship_model(batch=1, n_intervals=1, H=H, C=C, W=W)
    return peaks["tflops_bf16"] * model["attainable_frac"]


def _force(out):
    """Forces completion with a host readback of a scalar reduction.

    On the remote-tunnel TPU backend, ``block_until_ready`` does not reliably
    wait for execution of every program; converting a value to a Python float
    does (it must ship the bytes back).
    """
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0]).astype(jnp.float32))


def _slope_time(make_run, args, k1, k2, rounds=5):
    """Per-iteration device time via the two-length slope.

    ``make_run(k)`` must return a jitted callable over ``args`` whose body
    repeats the measured work ``k`` times inside ONE program (lax.scan).
    Reports median (T(k2) - T(k1)) / (k2 - k1): the subtraction cancels the
    remote tunnel's fixed per-execution cost — measured anywhere from 0.9 ms
    to 33 ms *per program* depending on tunnel weather — which on-host
    back-to-back execution never sees and which dividing a single scan's
    total by its length would smear into every number."""
    f1, f2 = make_run(k1), make_run(k2)
    _force(f1(*args))
    _force(f2(*args))
    slopes = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _force(f1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _force(f2(*args))
        t2 = time.perf_counter() - t0
        slopes.append((t2 - t1) / (k2 - k1))
    return float(np.median(slopes))


def _chained_time(op, x, reps=8, extras=(), unroll=False):
    """Per-iteration time of a jitted op with a forced serial dependency
    between iterations, slope-timed (see ``_slope_time``).  ``op`` must map
    (x, *extras) -> array; pass large side inputs through ``extras`` so they
    stay jit *arguments* (closed-over device arrays are serialised as
    program constants by the remote-compile tunnel).  ``reps`` sets the
    longer scan length.  ``unroll=True`` chains by a Python loop instead of
    ``lax.scan`` — needed for ops containing the VMEM-resident fit kernel,
    whose Mosaic compile inside a scan body is pathological (~6 min cold vs
    seconds unrolled; see docs/DESIGN.md)."""
    import jax
    import jax.numpy as jnp

    def make_run(k):
        def chained(x0, *extras_):
            def body(carry, _):
                y = op(carry, *extras_)
                bump = jnp.sum(y) * jnp.asarray(1e-20, x0.dtype)
                return x0 + bump.astype(x0.dtype), None

            if unroll:
                acc = x0
                for _ in range(k):
                    acc, _unused = body(acc, None)
                return acc
            final, _ = jax.lax.scan(body, x0, None, length=k)
            return final

        return jax.jit(chained)

    k1, k2 = reps, 5 * reps
    global _LAST_COST
    _LAST_COST = (roofline.cost_of(make_run(1), x, *extras), 1)
    return _slope_time(make_run, (x,) + tuple(extras), k1, k2)


def _scanned_train_time(step, params, opt_state, coeffs, y, reps=8):
    """Steady-state ms/step: optimiser steps chained inside ONE jitted
    lax.scan (the real training pattern), slope-timed between a ``reps``-
    and a ``5*reps``-step scan (see ``_slope_time`` for why the slope)."""
    import jax

    def make_run(k):
        def run(params, opt_state, coeffs, y):
            def body(carry, _):
                p, o = carry
                p, o, loss = step(p, o, coeffs, y)
                return (p, o), loss
            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=k)
            return losses[-1]
        return jax.jit(run)

    global _LAST_COST
    _LAST_COST = (roofline.cost_of(make_run(1), params, opt_state, coeffs, y), 1)
    return _slope_time(make_run, (params, opt_state, coeffs, y), reps, 5 * reps)


def _dopri_probe_cost(params, cfg, coeffs, reps):
    """Analytic FLOP/byte denominators for the adaptive (fused-dopri) train
    configs.  XLA's cost model cannot see inside the fused kernel's
    data-dependent while loop (it reports ~zero for the whole step), so the
    denominators come from a one-shot probe of the *realised* step counts on
    the identical solve (direct path, ``return_stats=True``) converted to
    FLOPs by the per-stage matmul counts of the MLP field.  First-order
    model: forward = NFE stage evaluations; fused backward replays each
    accepted step's 6 stages plus their VJPs (~3x a stage).  Bytes: the
    coefficient table (read forward + backward), the per-accepted-step
    trajectory store (write + read), and the dct cotangent table (write).
    """
    import jax.numpy as jnp
    import torchcde_tpu as tc
    from torchcde_tpu.models.neural_cde import cde_func, make_control, _dense

    X = make_control(coeffs, cfg)
    z0 = _dense(params["initial"], X.evaluate(X.interval[0]))
    _, stats = tc.cdeint(
        X=X, func=cde_func(params, cfg), z0=z0, t=X.interval, adjoint=False,
        method=cfg.solver, rtol=cfg.rtol, atol=cfg.atol, return_stats=True,
    )
    nfe = int(stats["nfe"])
    accepted = int(stats["steps_accepted"])
    B = int(np.prod(coeffs.shape[:-2]))
    n = int(coeffs.shape[-2])
    C, H, W = cfg.input_channels, cfg.hidden_channels, cfg.width
    stage = 2 * B * (H * W + W * C * H + H * C)
    flops = (nfe * stage + accepted * 6 * 3 * stage) * reps
    bytes_ = 4 * reps * (
        2 * B * n * int(coeffs.shape[-1])      # coefficient table, fwd + bwd
        + 2 * accepted * B * H                 # trajectory store + reload
        + B * n * int(coeffs.shape[-1])        # dct cotangents
    )
    return ({"flops": float(flops), "bytes": float(bytes_)}, reps,
            {"nfe": nfe, "steps_accepted": accepted,
             "flops_source": "analytic(nfe-probe)"})


def _adaptive_latency_floor(res, t_big, step, params, opt_state, coeffs, y,
                            cfg):
    """Quantified floor for the ``latency``-bound adaptive train entries
    (extends the round-4 floor methodology beyond cubic_fit/rev_heun): rerun
    the IDENTICAL jitted train step at batch 8.  The throughput terms (MXU
    FLOPs and HBM bytes) scale with batch; the dependency chain — NFE
    sequential stage evaluations threaded through the step-size controller
    inside one fused kernel launch (batch 8 still runs as one padded
    128-lane tile, so it is the same kernel and the same chain) — does not.

    The batch-8 subset's controller realises its own (usually shorter) NFE
    chain, so the floor is the batch-8 time taken AS IS when that chain is
    no longer than the entry's (a strictly shorter serial chain on the
    identical kernel cannot take longer than the floor it bounds), and
    scaled DOWN by the chain-length ratio when it is longer.  It is never
    scaled up: NFE-proportional extrapolation over-estimates (reject steps
    and backward replays are not uniform in cost), which round-5 measurement
    showed producing an impossible measured/floor < 1."""
    if res.get("bound") != "latency":
        return res
    co8, y8 = coeffs[:8], y[:8]
    t8 = _scanned_train_time(step, params, opt_state, co8, y8)
    _, _, extra8 = _dopri_probe_cost(params, cfg, co8, 1)
    nfe8 = max(int(extra8["nfe"]), 1)
    floor = t8 * min(1.0, float(res["nfe"]) / nfe8)
    res["latency_floor_ms"] = round(1e3 * floor, 3)
    res["latency_floor_batch8_ms"] = round(1e3 * t8, 3)
    res["latency_floor_nfe_batch8"] = nfe8
    res["measured_over_latency_floor"] = round(t_big / floor, 2)
    res["note"] = (
        "latency-floor bound: the identical fused train step at batch 8 "
        "(one padded 128-lane tile — same kernel, ~no throughput terms) "
        f"realising a {nfe8}-NFE chain vs this entry's {res['nfe']}; "
        "see _adaptive_latency_floor for the no-upscaling rule")
    return res


def _spiral(batch, length, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 4 * math.pi, length)
    phase = rng.uniform(0, 2 * math.pi, size=(batch, 1))
    y = (rng.random(batch) > 0.5).astype(np.float32)
    direction = np.where(y > 0.5, 1.0, -1.0)[:, None]
    radius = 0.5 + t / (4 * math.pi)
    x1 = radius * np.cos(direction * t + phase)
    x2 = radius * np.sin(direction * t + phase)
    X = np.stack([np.broadcast_to(t, x1.shape), x1, x2], axis=-1).astype(np.float32)
    return X, y


def bench_spiral():
    import jax, jax.numpy as jnp, optax
    import torchcde_tpu as tc
    from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
    from torchcde_tpu.models.training import make_train_step

    X, y = _spiral(256, 100)
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(jnp.asarray(X))
    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=8, output_channels=1,
        interpolation="cubic", solver="dopri5", adjoint=True,
    )
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    t = _scanned_train_time(step, params, opt_state, coeffs, jnp.asarray(y))
    global _LAST_COST
    cost, reps, extra = _dopri_probe_cost(params, cfg, coeffs, _LAST_COST[1])
    _LAST_COST = (cost, reps)
    res = _annotate(
        {"metric": "spiral train step (hermite+dopri5 adjoint, batch 256, len 100)",
         "value": round(1e3 * t, 3), "unit": "ms", **extra}, t,
        attainable_tflops=_mlp_attainable_tflops(
            cfg.hidden_channels, cfg.input_channels, cfg.width))
    return _adaptive_latency_floor(res, t, step, params, opt_state, coeffs,
                                   jnp.asarray(y), cfg)


def bench_spiral_dopri_adjoint():
    """The reference-DEFAULT configuration at north-star batch: dopri5,
    tolerance-controlled, adjoint=True (solver.py:195-198) at batch 4096 —
    routes to the fused adaptive kernel (chunk/group composition,
    solvers/fused_dopri_pallas.py)."""
    import jax, jax.numpy as jnp, optax
    import torchcde_tpu as tc
    from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
    from torchcde_tpu.models.training import make_train_step

    X, y = _spiral(4096, 100)
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(jnp.asarray(X))
    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=8, output_channels=1,
        interpolation="cubic", solver="dopri5", adjoint=True,
    )
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    t = _scanned_train_time(step, params, opt_state, coeffs, jnp.asarray(y))
    global _LAST_COST
    cost, reps, extra = _dopri_probe_cost(params, cfg, coeffs, _LAST_COST[1])
    _LAST_COST = (cost, reps)
    return _annotate(
        {"metric": "spiral train step (hermite+dopri5 adjoint, batch 4096, len 100)",
         "value": round(1e3 * t, 3), "unit": "ms", **extra}, t,
        attainable_tflops=_mlp_attainable_tflops(
            cfg.hidden_channels, cfg.input_channels, cfg.width))


def _profiler_fields(res, io_bytes, *ops_and_args):
    """Round-4 VERDICT item 4: attach MEASURED device-op timings to a
    ``vmem-resident`` entry via the JAX profiler (works through the axon
    tunnel).  v5e DRAM hardware counters are NOT exposed by the profiler
    (the xplane carries modeled bytes + measured durations only), so the
    honest measured figures are:

    - profiler_device_ms: measured device busy time (per-op durations)
    - profiler_gbps_cost_model: XLA cost-model bytes over that measured
      time (can exceed HBM peak when the working set is VMEM-resident —
      the excess is the measured fusion saving)
    - profiler_gbps_io_floor: unique input+output bytes over that measured
      time — a hard lower bound on achieved DRAM bandwidth
    """
    try:
        from torchcde_tpu.utils.observability import device_profile

        dev_ms = 0.0
        cm_bytes = 0.0
        for op, args in ops_and_args:
            p = device_profile(op, *args)
            dev_ms += p["device_ms"]
            cm_bytes += p["bytes_per_iter"]
        res["profiler_device_ms"] = round(dev_ms, 3)
        res["profiler_gbps_cost_model"] = round(
            cm_bytes / 1e9 / (dev_ms / 1e3), 1) if dev_ms else None
        res["profiler_gbps_io_floor"] = round(
            io_bytes / 1e9 / (dev_ms / 1e3), 1) if dev_ms else None
        if "note" in res and res.get("bound") == "vmem-resident":
            res["note"] = (
                "vmem-resident (measured): profiler_device_ms is measured "
                "per-op device time; cost-model bytes over it exceed HBM "
                "peak because the scan working set never leaves VMEM; "
                "profiler_gbps_io_floor (unique io bytes / measured time) "
                "is the hard lower bound on achieved DRAM bandwidth — v5e "
                "DRAM counters are not exposed through the JAX profiler")
    except Exception as e:  # profiler unavailable (e.g. tunnel hiccup)
        res["profiler_error"] = f"{type(e).__name__}: {e}"
    return res


def bench_irregular():
    import jax.numpy as jnp
    import torchcde_tpu as tc

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1024, 256, 8)).astype(np.float32)
    x[rng.random(x.shape) < 0.3] = np.nan
    t_chan = np.broadcast_to(np.linspace(0, 1, 256)[:, None], (1024, 256, 1)).astype(np.float32)
    x = np.concatenate([t_chan, x], axis=-1)
    xj = jnp.asarray(x)

    import jax

    # jit the whole pipeline: eager op-by-op execution pays a dispatch round
    # trip per op on the remote backend, which is not how preprocessing runs.
    global _LAST_COST
    t_lin = _chained_time(jax.jit(lambda a: tc.linear_interpolation_coeffs(a)), xj)
    cost_lin = _LAST_COST
    t_rect = _chained_time(
        jax.jit(lambda a: tc.linear_interpolation_coeffs(a, rectilinear=0)), xj
    )
    # Combine the two pipelines' costs for one roofline over the summed time.
    if cost_lin[0] is not None and _LAST_COST[0] is not None:
        _LAST_COST = (
            {"flops": cost_lin[0]["flops"] + _LAST_COST[0]["flops"],
             "bytes": cost_lin[0]["bytes"] + _LAST_COST[0]["bytes"]},
            _LAST_COST[1],
        )
    res = _annotate(
        {"metric": "irregular NaN linear+rectilinear coeffs (1024x256x9, 30% missing)",
         "value": round(1e3 * (t_lin + t_rect), 3), "unit": "ms"}, t_lin + t_rect)
    # unique IO: x in once per pipeline; coeff tables out (~x-sized for
    # linear, ~2x time-lagged rows for rectilinear — use the out sizes)
    lin = jax.jit(lambda a: tc.linear_interpolation_coeffs(a))
    rect = jax.jit(lambda a: tc.linear_interpolation_coeffs(a, rectilinear=0))
    out_b = sum(np.prod(o.shape) * 4 for o in
                (lin(xj), rect(xj)))
    return _profiler_fields(res, 2 * xj.nbytes + float(out_b),
                            (lin, (xj,)), (rect, (xj,)))


def bench_cubic_fit(batch=8192, length=4096, channels=1):
    import jax, jax.numpy as jnp
    import torchcde_tpu as tc
    import traffic_model

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, length, channels)).astype(np.float32)
    x[rng.random(x.shape) < 0.2] = np.nan
    xj = jnp.asarray(x)
    t = _chained_time(tc.natural_cubic_coeffs, xj, reps=4, unroll=True)
    gbytes = x.nbytes / 1e9
    res = _annotate(
        {"metric": f"natural cubic NaN-masked fit ({batch}x{length}x{channels})",
         "value": round(1e3 * t, 3), "unit": "ms",
         "gb_per_s": round(gbytes / t, 2)}, t)
    # Floor accounting (round-4 VERDICT item 2): the binding constraint is
    # the serial masked-scan chain, not HBM (traffic_model.cubic_fit_model;
    # the sub-size sweep that pins cycles/sub-step as structure is recorded
    # in its docstring).
    m = traffic_model.cubic_fit_model(batch, length, channels)
    res["min_hbm_mb_5pass"] = round(m["min_bytes"] / 1e6, 1)
    res["hbm_floor_ms_at_peak"] = round(m["hbm_floor_ms_at_peak"], 3)
    res["latency_floor_ms"] = round(m["latency_floor_ms"], 3)
    res["measured_over_latency_floor"] = round(1e3 * t / m["latency_floor_ms"], 2)
    res["note"] = (
        "latency-floor bound: 5 dependent masked-scan phases x "
        f"{m['substeps']} serial (8,256) sub-steps at a measured ~57 "
        "cycles/sub-step (sub=16/32/64 are measured regressions — "
        "traffic_model.cubic_fit_model); the 5-pass HBM floor "
        f"({res['hbm_floor_ms_at_peak']} ms) is not the binding constraint")
    return res


def bench_log_ode():
    import jax.numpy as jnp
    import torchcde_tpu as tc

    X, _y = _spiral(32, 10000)
    xj = jnp.asarray(X)

    import jax

    # logsig_windows itself refuses traced inputs (host window planning), so
    # both the timing and the denominators use its device core — the windowed
    # Chen reduction over the same window boundaries the wrapper derives for
    # this grid — which CAN be scanned for slope timing (see _slope_time).
    from torchcde_tpu.ops.logsignature import windowed_logsignatures

    boundaries = np.arange(0, xj.shape[-2], 100)
    if boundaries[-1] != xj.shape[-2] - 1:
        boundaries = np.append(boundaries, xj.shape[-2] - 1)

    op = jax.jit(lambda a: windowed_logsignatures(a, 3, boundaries))
    t = _chained_time(op, xj, reps=4)
    res = _annotate(
        {"metric": "depth-3 logsig windows (32x10000x3, window 100)",
         "value": round(1e3 * t, 3), "unit": "ms",
         "flops_source": "device-core (windowed_logsignatures)"}, t)
    out_b = float(np.prod(op(xj).shape)) * 4
    return _profiler_fields(res, xj.nbytes + out_b, (op, (xj,)))


def bench_log_ode_train():
    """BASELINE config 4's TRAINING step — the Neural RDE of the reference's
    example/logsignature_example.py:13-52: depth-3 windowed logsignatures of
    a length-10k series (window 100 -> 100 steps x 14 channels), LINEAR
    interpolation of the transformed path (logsignature_example.py:26), and
    the reference-default solve (dopri5 + adjoint, solver.py:195-198), batch
    256.  Routes to the fused adaptive kernel's linear-control mode
    (fused_dopri_pallas.py, slope-only slabs + left-continuous knots)."""
    import jax, jax.numpy as jnp, optax
    import torchcde_tpu as tc
    from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
    from torchcde_tpu.models.training import make_train_step

    on_tpu = jax.devices()[0].platform == "tpu"
    batch, length = (256, 10000) if on_tpu else (16, 1000)
    X, y = _spiral(batch, length)
    # The logsig transform is OFFLINE preprocessing (cached per the reference
    # README) and is timed separately by bench_log_ode; build it on the host
    # CPU backend so this entry times only the training step.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        logsig = tc.logsig_windows(jnp.asarray(X), 3, 100.0)
        coeffs_host = np.asarray(tc.linear_interpolation_coeffs(logsig))
    coeffs = jnp.asarray(coeffs_host)
    cfg = NeuralCDEConfig(
        input_channels=int(logsig.shape[-1]), hidden_channels=8,
        output_channels=1, interpolation="linear", solver="dopri5",
        adjoint=True,
    )
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    t = _scanned_train_time(step, params, opt_state, coeffs, jnp.asarray(y))
    global _LAST_COST
    cost, reps, extra = _dopri_probe_cost(params, cfg, coeffs, _LAST_COST[1])
    _LAST_COST = (cost, reps)
    res = _annotate(
        {"metric": (f"log-ODE Neural RDE train step (depth-3 logsig of "
                    f"{length}-len series, window 100, linear+dopri5 "
                    f"adjoint, batch {batch})"),
         "value": round(1e3 * t, 3), "unit": "ms", **extra}, t,
        attainable_tflops=_mlp_attainable_tflops(
            cfg.hidden_channels, cfg.input_channels, cfg.width))
    return _adaptive_latency_floor(res, t, step, params, opt_state, coeffs,
                                   jnp.asarray(y), cfg)


def bench_rev_heun():
    import jax, jax.numpy as jnp, optax
    import torchcde_tpu as tc
    from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
    from torchcde_tpu.models.training import make_train_step
    from torchcde_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch

    n_dev = len(jax.devices())
    batch = 16384 if jax.devices()[0].platform == "tpu" else 1024
    X, y = _spiral(batch, 100)
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(jnp.asarray(X))
    cfg = NeuralCDEConfig(
        input_channels=3, hidden_channels=8, output_channels=1,
        interpolation="cubic", solver="reversible_heun", adjoint=False, step_size=1.0,
    )
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    yj = jnp.asarray(y)
    if n_dev > 1:
        mesh = make_mesh(data=n_dev, model=1)
        coeffs = shard_batch(mesh, coeffs)
        yj = jax.device_put(yj, batch_sharding(mesh))

    t = _scanned_train_time(step, params, opt_state, coeffs, yj)
    global _LAST_COST
    cost_direct = _LAST_COST

    # BASELINE config 5 asks for "adjoint vs direct backprop": the direct
    # mode above (backprop through the fused scan) vs the O(1)-memory exact
    # inverse-map adjoint (reversible_adjoint.py) on the same model.
    cfg_adj = NeuralCDEConfig(
        input_channels=3, hidden_channels=8, output_channels=1,
        interpolation="cubic", solver="reversible_heun", adjoint=True,
        step_size=1.0,
    )
    step_adj = make_train_step(cfg_adj, opt)
    t_adj = _scanned_train_time(step_adj, params, opt_state, coeffs, yj)
    _LAST_COST = cost_direct  # annotate the headline (direct) timing

    # Floor accounting (round-4 VERDICT item 2): minimal bytes, thin-K
    # attainable compute, and the serial grid-step chain.
    import traffic_model

    # ct_bytes=4: this config's model dtype is f32, so the packed slabs and
    # the backward's dct stream are stored float32 (bf16 slabs only happen
    # when the model itself is bf16 — _pack_operands' dtype policy).
    m = traffic_model.rev_heun_model(batch, 99, H=8, C=3, W=128, ct_bytes=4)
    peaks = roofline._peak_for(roofline.chip_kind())
    att_tf = (peaks["tflops_bf16"] * m["attainable_frac"]) if peaks else None
    res = _annotate(
        {"metric": f"reversible-Heun train step (batch {batch}, {n_dev} device(s))",
         "value": round(1e3 * t, 3), "unit": "ms",
         "direct_backprop_ms": round(1e3 * t, 3),
         "inverse_map_adjoint_ms": round(1e3 * t_adj, 3)}, t,
        attainable_tflops=att_tf)
    res["min_hbm_mb_per_step"] = round(m["min_bytes_per_step"] / 1e6, 1)
    # XLA's cost_analysis only surfaces the forward pallas_call's declared
    # CostEstimate for this custom_vjp pair (the backward kernel's flops are
    # missing), so the roofline fields undercount ~3x: recompute the MXU
    # rate from the analytic op-mix model instead.
    tflops_model = m["flops_per_step"] / t / 1e12
    res["tflops"] = round(tflops_model, 3)
    res["flops_source"] = "analytic(rev_heun_model)"
    if att_tf:
        res["compute_floor_ms"] = round(
            m["flops_per_step"] / (att_tf * 1e12) * 1e3, 3)
        res["pct_attainable_mxu"] = round(100 * tflops_model / att_tf, 1)
        if tflops_model >= 0.7 * att_tf:
            res["bound"] = "mxu-attainable"
            res["note"] = (
                "at the thin-operand compute floor after interval-grouped "
                "grid steps: measured/floor = "
                f"{round(1e3 * t / res['compute_floor_ms'], 2)}x; see "
                "traffic_model.rev_heun_model for the bound")
    res["grid_steps_per_train_step"] = m["grid_steps"]
    return res


def bench_seq_pcr():
    """Sequence-sharded tridiagonal solve (distributed PCR over the mesh's
    model axis) — the scale-out path for cubic fits whose length axis exceeds
    one device (SURVEY.md section 5(b)).  Single-device runs fall back to a
    1-shard mesh so the entry always reports."""
    import jax, jax.numpy as jnp
    from torchcde_tpu.parallel.mesh import make_mesh
    from torchcde_tpu.parallel.seq_pcr import tridiagonal_solve_seq_sharded

    n_dev = len(jax.devices())
    model = n_dev if n_dev > 1 else 1
    mesh = make_mesh(data=1, model=model)
    batch, k = (2048, 8192) if jax.devices()[0].platform == "tpu" else (64, 1024)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((batch, k - 1)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((batch, k - 1)), jnp.float32)
    pad = jnp.zeros((batch, 1), jnp.float32)
    d = 1.0 + jnp.abs(jnp.concatenate([u, pad], -1)) + jnp.abs(
        jnp.concatenate([pad, l], -1)
    )

    def op(b, u, d, l):
        return tridiagonal_solve_seq_sharded(b, u, d, l, mesh, axis="model")

    b = jnp.asarray(rng.standard_normal((batch, k)), jnp.float32)
    t = _chained_time(op, b, reps=4, extras=(u, d, l))
    res = {"metric": f"seq-sharded tridiagonal solve ({batch}x{k}, {model} shard(s))",
           "value": round(1e3 * t, 3), "unit": "ms"}
    if model == 1:
        res["note"] = ("collectives untimed: 1 real chip, so the ppermute "
                       "halo-exchange path is CPU-mesh-tested (tests/"
                       "test_parallel.py) but not timed here")
    return _annotate(res, t)


def bench_seq_masked():
    """BASELINE config 3 (NaN-masked cubic fit) with the LENGTH axis across
    the mesh (parallel/seq_masked.py).  Single-device runs use a 1-shard mesh
    so the entry always reports."""
    import jax, jax.numpy as jnp
    from torchcde_tpu.parallel.mesh import make_mesh
    from torchcde_tpu.parallel.seq_masked import natural_cubic_coeffs_seq_sharded

    n_dev = len(jax.devices())
    model = n_dev if n_dev > 1 else 1
    mesh = make_mesh(data=1, model=model)
    batch, length = (2048, 4096) if jax.devices()[0].platform == "tpu" else (32, 512)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, length, 1)).astype(np.float32)
    x[rng.random(x.shape) < 0.2] = np.nan
    xj = jnp.asarray(x)

    def op(a):
        return natural_cubic_coeffs_seq_sharded(a, None, mesh, axis="model")

    t = _chained_time(jax.jit(op), xj, reps=4)
    gbytes = x.nbytes / 1e9
    res = {"metric": f"seq-sharded NaN cubic fit ({batch}x{length}, {model} shard(s))",
           "value": round(1e3 * t, 3), "unit": "ms",
           "gb_per_s": round(gbytes / t, 2)}
    if model == 1:
        res["note"] = ("1-shard mesh: natural_cubic_coeffs_seq_sharded "
                       "degrades to the single-device streaming kernel "
                       "(SPIKE's 3x local solves have nothing to amortise "
                       "against — round 5), so this entry times that kernel "
                       "at this shape; the ppermute/SPIKE halo path is "
                       "CPU-mesh-tested (tests/test_parallel.py) but "
                       "untimed: 1 real chip")
    return _annotate(res, t)


def bench_per_sample():
    """Per-sample adaptive stepping (options={'per_sample': True}, torchode
    arxiv 2210.12375) on a mixed-stiffness batch: reports wall-clock plus
    the NFE accounting that motivates the mode — the whole-batch RMS-norm
    controller spends batch x worst-case evaluations, the per-sample
    controller the sum of what each sample actually needs."""
    import jax, jax.numpy as jnp
    import torchcde_tpu as tc

    from torchcde_tpu.solvers import fused_pallas
    from torchcde_tpu.solvers.terms import MLPVectorField

    # Length 1024 (round-5): the coefficient table streams through the
    # per-lane kernel as carried VMEM chunks — exactly the long irregular
    # series the mode exists for (round-4 VERDICT missing #2).
    batch, length, hidden, width = (
        (256, 1024, 8, 32) if jax.devices()[0].platform == "tpu"
        else (16, 30, 4, 8))
    rng = np.random.default_rng(0)
    # Scale 0.06: at unit scale every lane of this 1023-unit span needs more
    # attempts than ANY budget (the round-4 bench's nfe mean == max == the
    # stats cap was budget saturation, not stiffness spread) — tamed, every
    # lane completes inside BOTH paths' budgets (the XLA path's default is
    # 4096 attempts; the fused path's is its per-chunk capacity), so the
    # speedup is full-work vs full-work and the NFE accounting below
    # measures what the mode actually saves.
    x = rng.standard_normal((batch, length, 3)).astype(np.float32) * 0.06
    # Magnitude spread -> genuinely different per-sample step counts.
    x *= (10.0 ** np.linspace(-0.5, 0.5, batch))[:, None, None].astype(np.float32)
    coeffs = jax.jit(tc.hermite_cubic_coefficients_with_backward_differences)(
        jnp.asarray(x))
    X = tc.CubicSpline(coeffs)
    w1 = jnp.asarray(rng.standard_normal((hidden, width)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((width,)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((width, hidden * 3)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((hidden * 3,)) * 0.2, jnp.float32)
    func = MLPVectorField(w1, b1, w2, b2, hidden, 3)
    z0j = jnp.asarray(rng.standard_normal((batch, hidden)), jnp.float32)

    def make_op(max_steps):
        def op(z0_, c_):
            # Fused run: no explicit max_steps — the kernel budgets per
            # chunk (an explicit budget larger than a chunk's own would
            # decline to the XLA path) and completes every lane here.
            Xl = tc.CubicSpline(c_)
            return tc.cdeint(X=Xl, func=func, z0=z0_, t=Xl.interval,
                             method="dopri5", adjoint=False,
                             max_steps=max_steps,
                             options=dict(per_sample=True))[..., -1, :]
        return op

    op = make_op(None)
    # Default dispatch: the fused per-lane Pallas kernel
    # (solvers/fused_dopri_persample.py) on TPU.
    t = _chained_time(op, z0j, reps=4, extras=(coeffs,))
    # The round-3 formulation: vmapped per-stage XLA dispatches.  Its
    # bounded-loop discipline pays the WHOLE step budget regardless of when
    # lanes finish, and its default budget (4096 attempts) truncates the
    # hardest lanes of this problem (measured need: 1617..7642 attempts) —
    # give it the budget that completes every lane so the comparison is
    # full work vs full work.
    fused_pallas.force_fused_pallas(False)
    try:
        t_xla = _chained_time(make_op(8192), z0j, reps=4, extras=(coeffs,))
    finally:
        fused_pallas.force_fused_pallas(None)

    # The timed fused run must be doing FULL work for the comparison to be
    # fair: check no lane NaN-poisoned on a per-chunk capacity budget.
    out_fused = np.asarray(op(z0j, coeffs))
    finite_lanes = int(np.isfinite(out_fused).all(axis=-1).sum())

    _, stats_ps = tc.cdeint(X=X, func=func, z0=z0j, t=X.interval,
                            method="dopri5", adjoint=False, max_steps=8192,
                            return_stats=True, options=dict(per_sample=True))
    _, stats_bn = tc.cdeint(X=X, func=func, z0=z0j, t=X.interval,
                            method="dopri5", adjoint=False, max_steps=8192,
                            return_stats=True)
    nfe_ps = np.asarray(stats_ps["nfe"])
    nfe_bn = int(np.asarray(stats_bn["nfe"]))

    # Latency floor (round 5, completing the round-4 floor methodology for
    # the last unquantified `latency` entry): lanes step independently
    # inside the per-lane kernel, so wall time is bounded below by the
    # HARDEST lane's serial attempt chain.  Measure exactly that — the
    # argmax-NFE lane replicated to a tiny batch through the identical
    # kernel (throughput terms stripped, same chain) — and take it as is.
    global _LAST_COST
    cost_full = _LAST_COST
    hard = int(np.argmax(nfe_ps))
    co_h = jnp.repeat(coeffs[hard:hard + 1], 8, axis=0)
    z0_h = jnp.repeat(z0j[hard:hard + 1], 8, axis=0)
    t_hard = _chained_time(op, z0_h, reps=4, extras=(co_h,))
    _LAST_COST = cost_full  # annotate the full-batch timing, not the probe
    floor_fields = {
        "latency_floor_ms": round(1e3 * t_hard, 3),
        "latency_floor_note": (
            "the hardest lane (argmax per-sample NFE) replicated to one "
            "tiny batch through the identical per-lane kernel: its serial "
            "attempt chain alone, throughput terms stripped"),
        "measured_over_latency_floor": round(t / t_hard, 2),
    }
    return _annotate(
        {"metric": (f"per-sample dopri5 solve (batch {batch}, length {length},"
                    f" mixed stiffness)"),
         "value": round(1e3 * t, 3), "unit": "ms",
         "xla_path_ms": round(1e3 * t_xla, 3),
         "fused_speedup_vs_xla_path": round(t_xla / t, 2),
         "fused_finite_lanes": f"{finite_lanes}/{batch}",
         "nfe_per_sample_mean": round(float(nfe_ps.mean()), 1),
         "nfe_per_sample_min": int(nfe_ps.min()),
         "nfe_per_sample_max": int(nfe_ps.max()),
         "nfe_batch_norm": nfe_bn,
         "nfe_note": (
             "the whole-batch RMS norm finishes in fewer attempts than the "
             "hardest lane needs alone because the sqrt(batch) averaging "
             "DILUTES stiff lanes' error (their local error is under-"
             "controlled by ~16x at batch 256) — the per-sample controller "
             "resolves every lane at the requested tolerance (torchode, "
             "arxiv 2210.12375)"),
         **floor_fields}, t)


BENCHES = {
    "spiral": bench_spiral,
    "spiral_dopri_adjoint": bench_spiral_dopri_adjoint,
    "irregular": bench_irregular,
    "cubic_fit": bench_cubic_fit,
    "log_ode": bench_log_ode,
    "log_ode_train": bench_log_ode_train,
    "rev_heun": bench_rev_heun,
    "seq_pcr": bench_seq_pcr,
    "seq_masked": bench_seq_masked,
    "per_sample": bench_per_sample,
}


def main(names, record_path=None, extra_results=()):
    results = list(extra_results)
    for name in names or list(BENCHES):
        result = BENCHES[name]()
        result["name"] = name
        print(json.dumps(result))
        results.append(result)
    if record_path:
        # The driver-visible, regenerable all-config record (VERDICT.md round
        # 2 item 3): one entry per config with the roofline fields.
        with open(record_path, "w") as f:
            json.dump({"results": results}, f, indent=1)
    return results


if __name__ == "__main__":
    argv = sys.argv[1:]
    record = None
    if "--record" in argv:
        i = argv.index("--record")
        record = argv[i + 1] if len(argv) > i + 1 else "BENCHMARKS.json"
        argv = argv[:i] + argv[i + 2 if len(argv) > i + 1 else i + 1:]
    main(argv, record_path=record)
