"""cdeint: the solver front-end.

API parity with /root/reference/torchcde/solver.py:144-245, natively on
JAX/XLA instead of delegating to torchdiffeq/torchsde:

    cdeint(X, func, z0, t, adjoint=True, backend="native", **kwargs)

solves z_t = z_{t0} + int_{t0}^t f(s, z_s) dX_s and returns z at each t[i]
with shape (..., len(t), hidden_channels) (time second-to-last, exactly as the
reference's output permute at solver.py:234-243).

Differences from the reference, by design:
* ``backend="torchdiffeq"`` / ``"torchsde"`` are accepted as compatibility
  aliases — both route to the native steppers (``dt`` maps to ``step_size``).
* ``adjoint_params`` defaults to a *superset* of the reference's default: the
  adjoint pass closure-converts the vector field, so gradients flow to every
  array the field closes over (func parameters, interpolation coefficients,
  knot times) automatically — the contract tested by reference
  test/test_tricks.py:21-49.  Passing ``adjoint_params`` explicitly restricts
  the adjoint integration to those tensors (reference solver.py:207-222),
  e.g. ``adjoint_params=()`` skips parameter adjoints entirely.
* Tolerance defaults match the reference: atol=1e-6, rtol=1e-4, with adjoint
  tolerances mirroring (solver.py:195-203).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import is_concrete
from .adjoint import odeint_adjoint
from .integrate import SolverConfig, odeint
from .terms import make_cde_rhs

_FIXED_METHODS = ("euler", "midpoint", "heun", "heun3", "rk4",
                  "reversible_heun", "explicit_adams", "implicit_adams",
                  "fixed_adams")


def _shape(x):
    return tuple(x.shape)


def _check_compatability_per_tensor_base(control_gradient, z0):
    if _shape(control_gradient)[:-1] != _shape(z0)[:-1]:
        raise ValueError(
            "X.derivative did not return a tensor with the same number of batch dimensions as "
            "z0. X.derivative returned shape {} (meaning {} batch dimensions), whilst z0 has "
            "shape {} (meaning {} batch dimensions).".format(
                _shape(control_gradient),
                _shape(control_gradient)[:-1],
                _shape(z0),
                _shape(z0)[:-1],
            )
        )


def _check_compatability_per_tensor_forward(control_gradient, system, z0):
    _check_compatability_per_tensor_base(control_gradient, z0)
    if _shape(system)[:-2] != _shape(z0)[:-1]:
        raise ValueError(
            "func did not return a tensor with the same number of batch dimensions as z0. func "
            "returned shape {} (meaning {} batch dimensions), whilst z0 has shape {} (meaning {}"
            " batch dimensions).".format(
                _shape(system), _shape(system)[:-2], _shape(z0), _shape(z0)[:-1]
            )
        )
    if system.shape[-2] != z0.shape[-1]:
        raise ValueError(
            "func did not return a tensor with the same number of hidden channels as z0. func "
            "returned shape {} (meaning {} channels), whilst z0 has shape {} (meaning {} "
            "channels).".format(_shape(system), system.shape[-2], _shape(z0), z0.shape[-1])
        )
    if system.shape[-1] != control_gradient.shape[-1]:
        raise ValueError(
            "func did not return a tensor with the same number of input channels as X.derivative "
            "returned. func returned shape {} (meaning {} channels), whilst X.derivative "
            "returned shape {} (meaning {} channels).".format(
                _shape(system),
                system.shape[-1],
                _shape(control_gradient),
                control_gradient.shape[-1],
            )
        )


def _check_compatability_per_tensor_prod(control_gradient, vector_field, z0):
    _check_compatability_per_tensor_base(control_gradient, z0)
    if _shape(vector_field) != _shape(z0):
        raise ValueError(
            "func.prod did not return a tensor with the same shape as z0. func.prod returned "
            "shape {} whilst z0 has shape {}.".format(_shape(vector_field), _shape(z0))
        )


def _is_array(x):
    return isinstance(x, (jnp.ndarray, np.ndarray, jax.core.Tracer)) or hasattr(x, "shape")


def _check_compatability(X, func, z0, t):
    """Mirror of solver.py:44-100: probe the control and field once, validate
    shapes eagerly at trace time (shape information is static under jit)."""
    if not hasattr(X, "derivative"):
        raise ValueError("X must have a 'derivative' method.")
    control_gradient = X.derivative(jax.lax.stop_gradient(t[0]))
    if hasattr(func, "prod"):
        is_prod = True
        vector_field = func.prod(t[0], z0, control_gradient)
    else:
        is_prod = False
        system = func(t[0], z0)

    if _is_array(z0) and not isinstance(z0, (tuple, list)):
        is_tensor = True
        if not _is_array(control_gradient) or isinstance(control_gradient, (tuple, list)):
            raise ValueError("z0 is a tensor and so X.derivative must return a tensor as well.")
        if is_prod:
            if not _is_array(vector_field) or isinstance(vector_field, (tuple, list)):
                raise ValueError("z0 is a tensor and so func.prod must return a tensor as well.")
            _check_compatability_per_tensor_prod(control_gradient, vector_field, z0)
        else:
            if not _is_array(system) or isinstance(system, (tuple, list)):
                raise ValueError("z0 is a tensor and so func must return a tensor as well.")
            _check_compatability_per_tensor_forward(control_gradient, system, z0)
    elif isinstance(z0, (tuple, list)):
        is_tensor = False
        if not isinstance(control_gradient, (tuple, list)):
            raise ValueError("z0 is a tuple/list and so X.derivative must return a tuple/list as well.")
        if len(z0) != len(control_gradient):
            raise ValueError("z0 and X.derivative(t) must be tuples of the same length.")
        if is_prod:
            if not isinstance(vector_field, (tuple, list)):
                raise ValueError("z0 is a tuple/list and so func.prod must return a tuple/list as well.")
            if len(z0) != len(vector_field):
                raise ValueError("z0 and func.prod(t, z, dXdt) must be tuples of the same length.")
            for cg, vf, z0_ in zip(control_gradient, vector_field, z0):
                _check_compatability_per_tensor_prod(cg, vf, z0_)
        else:
            if not isinstance(system, (tuple, list)):
                raise ValueError("z0 is a tuple/list and so func must return a tuple/list as well.")
            if len(z0) != len(system):
                raise ValueError("z0 and func(t, z) must be tuples of the same length.")
            for cg, sys_, z0_ in zip(control_gradient, system, z0):
                _check_compatability_per_tensor_forward(cg, sys_, z0_)
    else:
        raise ValueError("z0 must either a tensor or a tuple/list of tensors.")

    return is_tensor, is_prod


def _as_tuple_state(z0):
    if isinstance(z0, list):
        return tuple(z0)
    return z0


def _knots_hint_of(X):
    """The control's knot count, sizing the default adaptive step budget
    (integrate.py): adaptive CDE solves track the control's knots, so the
    differentiable path can compile a loop near the realised step count."""
    grid = getattr(X, "grid_points", None)
    if grid is None:
        return None
    try:
        return int(np.shape(grid)[-1])
    except (TypeError, IndexError):
        return None


def _derive_fixed_adjoint_max_steps(adjoint_max_steps, adjoint_method,
                                    adjoint_step_size, t):
    """The adjoint integrates over traced sub-intervals, so a fixed-step
    adjoint needs an explicit step bound; derive it from t when concrete."""
    if adjoint_max_steps is None and adjoint_method in _FIXED_METHODS:
        if adjoint_step_size is not None and is_concrete(t):
            tv = np.asarray(t, dtype=np.float64)
            return max(
                1,
                int(np.max(np.ceil(np.diff(tv, axis=-1) / float(adjoint_step_size) - 1e-9))),
            )
    return adjoint_max_steps


def _match_adjoint_params(adjoint_params, consts):
    """Reference semantics (solver.py:207-222): ONLY the listed tensors
    receive adjoint gradients.  Matching is by Python object identity
    against the hoisted closure constants; if any requested tensor cannot
    be identified (tracing can rebind them), fall back to the full
    superset — gradients stay correct, only the saving is forfeited."""
    if adjoint_params is None:
        return None
    wanted = {id(p) for p in jax.tree_util.tree_leaves(adjoint_params)}
    grad_mask = tuple(id(c) in wanted for c in consts)
    if sum(grad_mask) < len(wanted):
        warnings.warn(
            "Could not identify every adjoint_params entry among the "
            "arrays the vector field closes over; computing adjoint "
            "gradients for the full closure superset instead."
        )
        return None
    return grad_mask


def cdeint(X, func, z0, t, adjoint=True, backend="native", **kwargs):
    r"""Solves a system of controlled differential equations.

    Solves z_t = z_{t_0} + \int_{t_0}^t f(s, z_s) dX_s.

    Arguments (mirroring reference solver.py:144-192):
        X: a control with a ``derivative(t) -> (..., input_channels)`` method,
            e.g. ``CubicSpline`` / ``LinearInterpolation`` / ``TupleControl``.
        func: callable f(t, z) -> (..., hidden_channels, input_channels), or an
            object with a ``prod(t, z, dXdt) -> (..., hidden_channels)`` method
            for a fused matrix-vector product.
        z0: initial state (..., hidden_channels); may be a tuple of arrays.
        t: 1-D array of output times (strictly increasing).
        adjoint: whether to backpropagate via the memory-efficient adjoint
            (continuous backsolve through ``custom_vjp``) rather than
            differentiating through the solver steps.
        backend: "native" (or the compatibility aliases "torchdiffeq" /
            "torchsde", which route to the same native steppers).
        **kwargs: rtol, atol, method,
            options={'step_size':…, 'jump_t':…, 'per_sample':…},
            step_size, max_steps, dt (alias for step_size),
            adjoint_rtol/atol/method/options/params.

            ``options={'per_sample': True}`` (adaptive methods, tensor
            batched state; beyond the reference) gives every batch element
            its own error norm, PI controller and acceptance sequence — the
            torchode design (arxiv 2210.12375) — instead of torchdiffeq's
            whole-batch RMS norm, so one stiff sample neither drags the
            batch to its step size nor has its error diluted by easy
            samples.  ``return_stats`` then reports per-sample counters,
            and ``t`` may be batched — shape (..., n_times) matching the
            state's batch dims — giving every sample its own
            output/integration span (variable-length series).

    Returns:
        z at each t[i]: shape (..., len(t), hidden_channels) per state leaf.
    """
    kwargs = dict(kwargs)
    atol = kwargs.pop("atol", 1e-6)
    rtol = kwargs.pop("rtol", 1e-4)

    options = dict(kwargs.pop("options", {}) or {})
    step_size = kwargs.pop("step_size", None)
    if "step_size" in options:
        step_size = options.pop("step_size")
    dt = kwargs.pop("dt", None)
    if dt is not None and step_size is None:
        step_size = dt
    jump_t = options.pop("jump_t", None)
    per_sample = options.pop("per_sample", False)
    scipy_solver_name = options.pop("solver", None)  # scipy_solver's option
    if options:
        warnings.warn(f"Ignoring unsupported solver options: {sorted(options)}")

    if backend == "torchsde":
        method = kwargs.pop("method", "midpoint")
        # SDE-solver names whose zero-diffusion discretisation coincides
        # EXACTLY with a native stepper (the CDE reduction always has g = 0,
        # reference solver.py:140-141): milstein's Levy-area correction and
        # euler_heun's diffusion stage vanish identically, leaving the Euler
        # drift step.  Names whose drift tableau has no exact native
        # counterpart (e.g. "srk") are not aliased.
        method = {"milstein": "euler", "euler_heun": "euler"}.get(method, method)
    elif backend in ("native", "torchdiffeq"):
        method = kwargs.pop("method", None) or "dopri5"
    else:
        raise ValueError(f"Unrecognised backend={backend}")

    max_steps = kwargs.pop("max_steps", None)
    return_stats = kwargs.pop("return_stats", False)

    adjoint_rtol = kwargs.pop("adjoint_rtol", rtol)
    adjoint_atol = kwargs.pop("adjoint_atol", atol)
    adjoint_method = kwargs.pop("adjoint_method", method)
    adjoint_options = dict(kwargs.pop("adjoint_options", {}) or {})
    adjoint_step_size = adjoint_options.pop("step_size", step_size)
    adjoint_params = kwargs.pop("adjoint_params", None)
    adjoint_max_steps = kwargs.pop("adjoint_max_steps", max_steps)
    if kwargs:
        warnings.warn(f"Ignoring unsupported cdeint kwargs: {sorted(kwargs)}")

    if not isinstance(t, np.ndarray):
        # np grids (the default-grid case) stay host-side so step counts
        # remain statically computable under jit.
        t = jnp.asarray(t)
    if step_size is not None and is_concrete(step_size):
        step_size = float(step_size)
    # Validate output-time ordering here, for EVERY path: the adaptive
    # drivers also guard (integrate.py), but the fixed-step fast paths plan
    # the solve from t directly and would otherwise return a garbage row for
    # an out-of-order time instead of an error.  (Batched per-sample t is
    # validated row-wise in _cdeint_per_sample.)
    if jnp.ndim(t) == 1 and is_concrete(t):
        tv = np.asarray(t)
        if tv.shape[0] > 1 and not bool(np.all(np.diff(tv) > 0)):
            raise ValueError("t must be monotonically increasing.")

    z0 = _as_tuple_state(z0)
    if per_sample and jnp.ndim(t) > 1:
        # Per-sample output/integration spans (torchode's t_eval): t of
        # shape (..., n_times) matching the state's batch dims — every
        # sample integrates over and reads out at its own times (e.g.
        # variable-length series ending at different t).  Validate against
        # one representative row here; _cdeint_per_sample checks every
        # row's monotonicity when t is concrete.
        _check_compatability(X, func, z0, jnp.reshape(t, (-1, t.shape[-1]))[0])
    else:
        _check_compatability(X, func, z0, t)

    if method == "scipy_solver":
        # torchdiffeq's host-side escape hatch (method="scipy_solver",
        # options={"solver": "RK45"|"LSODA"|...}): delegate stepping to
        # scipy.integrate.solve_ivp.  Offline/debug capability parity only —
        # it runs EAGERLY on the host (each vector-field evaluation is a
        # dispatched device call), requires concrete inputs, and supports no
        # gradients; every production path uses the native compiled solvers.
        if per_sample:
            raise ValueError(
                "scipy_solver does not support options={'per_sample': True} "
                "(host-side whole-batch stepping has no per-sample control)."
            )
        if jnp.ndim(t) > 1:
            raise ValueError(
                "scipy_solver requires 1-D output times t (batched t is a "
                "per_sample feature of the native adaptive solvers)."
            )
        return _cdeint_scipy(X, func, z0, t, rtol=rtol, atol=atol,
                             solver=scipy_solver_name or "RK45",
                             adjoint=adjoint, return_stats=return_stats)

    if per_sample:
        # torchode-style per-sample adaptive stepping (torchode,
        # arxiv 2210.12375): every batch element gets its own PI controller,
        # initial step, and acceptance sequence, instead of torchdiffeq's
        # whole-batch error norm — one stiff sample no longer drags the
        # entire batch to its step size.
        return _cdeint_per_sample(
            X, func, z0, t, adjoint=adjoint, backend=backend, method=method,
            rtol=rtol, atol=atol, step_size=step_size, max_steps=max_steps,
            return_stats=return_stats, jump_t=jump_t,
            adjoint_rtol=adjoint_rtol, adjoint_atol=adjoint_atol,
            adjoint_method=adjoint_method, adjoint_step_size=adjoint_step_size,
            adjoint_params=adjoint_params, adjoint_max_steps=adjoint_max_steps,
        )

    knots_hint = _knots_hint_of(X)

    cfg = SolverConfig(
        method=method, rtol=rtol, atol=atol, step_size=step_size,
        max_steps=max_steps, knots_hint=knots_hint,
    )

    rhs = make_cde_rhs(func, X)

    stats = None
    if return_stats and adjoint:
        raise ValueError(
            "return_stats=True requires adjoint=False (solver statistics are "
            "collected on the direct path)."
        )

    if adjoint and method == "reversible_heun":
        # The algebraically-reversible stepper gets its specialised exact
        # O(1)-memory adjoint (reversible_adjoint.py) instead of the
        # continuous backsolve.
        from .reversible_adjoint import reversible_heun_solve

        if jump_t is not None:
            warnings.warn(
                "options={'jump_t': ...} is ignored by fixed-step methods "
                "(reversible_heun): steps may straddle the declared "
                "derivative discontinuities."
            )
        if not is_concrete(t):
            raise ValueError(
                "reversible_heun with adjoint=True needs concrete output "
                "times (the exact step sequence is replayed in reverse)."
            )
        if step_size is None:
            step_size = float(np.max(np.diff(np.asarray(t, dtype=np.float64))))

        # Knot-aligned MLP solves fuse the whole reversible walk — forward
        # and the exact inverse-map adjoint — into single Pallas kernels
        # (solvers/fused_pallas.py); declines off-TPU / outside its caps.
        from .fused_pallas import try_fused_reversible_heun

        out = try_fused_reversible_heun(X, func, z0, t, step_size)
        if out is not None:
            return jax.tree_util.tree_map(lambda o: jnp.moveaxis(o, 0, -2), out)

        rhs_conv, consts = jax.closure_convert(rhs, t[0], z0)
        out = reversible_heun_solve(
            lambda s, z, c: rhs_conv(s, z, *c), list(consts), z0, t, step_size
        )
        out = jax.tree_util.tree_map(lambda o: jnp.moveaxis(o, 0, -2), out)
        if return_stats:
            return out, stats
        return out

    if (adjoint and jump_t is None and adjoint_params is None
            and adjoint_method == method and adjoint_step_size == step_size):
        # Solves of the canonical MLP vector field route to the fused Pallas
        # kernels (solvers/fused_pallas.py, fused_dopri_pallas.py): their
        # hand-written backwards store only per-knot / per-accepted-step
        # states — within the adjoint's memory contract — and reverse the
        # exact forward computation, so they are both faster and more
        # accurate than the continuous backsolve.  Decline (None) off-TPU,
        # for non-MLP fields, or outside the kernels' caps; the scan fast
        # path is NOT used here (pallas_only) because direct XLA autodiff
        # through the scan would store every stage activation.
        out = None
        if method == "dopri5" and step_size is None:
            if adjoint_rtol == rtol and adjoint_atol == atol:
                from .fused_dopri_pallas import try_fused_dopri5

                out = try_fused_dopri5(X, func, z0, t, cfg)
        else:
            from .fused_fixed import try_fused_fixed

            out = try_fused_fixed(X, func, z0, t, method, step_size,
                                  pallas_only=True)
        if out is not None:
            return jax.tree_util.tree_map(lambda o: jnp.moveaxis(o, 0, -2), out)

    if adjoint:
        adjoint_max_steps = _derive_fixed_adjoint_max_steps(
            adjoint_max_steps, adjoint_method, adjoint_step_size, t)
        adjoint_cfg = SolverConfig(
            method=adjoint_method,
            rtol=adjoint_rtol,
            atol=adjoint_atol,
            step_size=adjoint_step_size,
            max_steps=adjoint_max_steps,
            knots_hint=knots_hint,
        )
        rhs_conv, consts = jax.closure_convert(rhs, t[0], z0)
        consts = list(consts)
        # None: every array the vector field closes over gets adjoint
        # gradients — a superset of the reference's default
        # (solver.py:207-222: func parameters + raw coefficient tensors).
        grad_mask = _match_adjoint_params(adjoint_params, consts)
        out = odeint_adjoint(
            lambda s, z, c: rhs_conv(s, z, *c),
            consts,
            z0,
            t,
            cfg,
            adjoint_cfg,
            jump_t,
            grad_mask=grad_mask,
        )
    else:
        out = None
        if jump_t is None and not return_stats:
            # Knot-aligned fused fast path: streams coefficient rows through
            # the step scan, eliminating per-stage searchsorted + gathers
            # (see solvers/fused_fixed.py); produces the identical step
            # sequence or declines.
            if method == "reversible_heun" and step_size is not None:
                # The fused reversible kernel's inverse-map backward yields
                # the same exact discrete gradients as direct autodiff
                # through the step scan, so it serves adjoint=False too.
                from .fused_pallas import try_fused_reversible_heun

                out = try_fused_reversible_heun(X, func, z0, t, step_size)
            elif method == "dopri5" and step_size is None:
                # Fused adaptive kernel: frozen-mesh gradients identical in
                # kind to direct backprop through the XLA adaptive loop.
                from .fused_dopri_pallas import try_fused_dopri5

                out = try_fused_dopri5(X, func, z0, t, cfg)
            else:
                from .fused_fixed import try_fused_fixed

                out = try_fused_fixed(X, func, z0, t, method, step_size)
        if out is None:
            out = odeint(rhs, z0, t, cfg, jump_t, collect_stats=return_stats)
            if return_stats:
                out, stats = out

    # Move time from leading to second-to-last (solver.py:234-243).
    out = jax.tree_util.tree_map(lambda o: jnp.moveaxis(o, 0, -2), out)
    if return_stats:
        return out, stats
    return out


def _cdeint_scipy(X, func, z0, t, *, rtol, atol, solver, adjoint,
                  return_stats):
    """``method="scipy_solver"``: host-side stepping via
    scipy.integrate.solve_ivp (torchdiffeq's ScipyWrapperODESolver
    capability, consumed through the reference's ``method=`` passthrough at
    solver.py:226-227).  The whole batch flattens into one ODE system, like
    torchdiffeq's wrapper.  Eager and gradient-free by construction."""
    import scipy.integrate

    if isinstance(z0, tuple):
        raise ValueError(
            "scipy_solver supports a single tensor state (got a tuple).")
    if return_stats:
        raise ValueError("scipy_solver does not collect solver statistics.")
    if adjoint:
        # adjoint=True is cdeint's DEFAULT, and torchdiffeq's odeint_adjoint
        # accepts scipy_solver (the backsolve is just more odeint calls) —
        # so reference-default code `cdeint(..., method='scipy_solver')` must
        # run.  This eager escape hatch has no gradient graph either way, so
        # adjoint=True is treated as "no gradients requested" with a warning
        # rather than an error.
        import warnings
        warnings.warn(
            "scipy_solver runs on the host without a differentiable graph; "
            "adjoint=True is ignored (gradients are not supported)."
        )
    leaves = jax.tree_util.tree_leaves((X, z0, t))
    if not all(is_concrete(l) for l in leaves):
        raise ValueError(
            "scipy_solver is a host-side (eager) backend and requires "
            "concrete inputs; call it outside jit/grad."
        )
    rhs = make_cde_rhs(func, X)
    z0 = jnp.asarray(z0)
    shape = z0.shape
    dtype = z0.dtype
    t_np = np.asarray(t, dtype=np.float64)

    def rhs_np(tt, yy):
        z = jnp.asarray(yy.reshape(shape), dtype=dtype)
        dz = rhs(jnp.asarray(tt, dtype=dtype), z)
        return np.asarray(dz, dtype=np.float64).ravel()

    sol = scipy.integrate.solve_ivp(
        rhs_np, (t_np[0], t_np[-1]), np.asarray(z0, np.float64).ravel(),
        t_eval=t_np, rtol=rtol, atol=atol, method=solver,
    )
    if not sol.success:
        raise RuntimeError(f"scipy_solver ({solver}) failed: {sol.message}")
    out = jnp.asarray(sol.y.T.reshape((len(t_np),) + shape), dtype=dtype)
    return jnp.moveaxis(out, 0, -2)


def _cdeint_per_sample(X, func, z0, t, *, adjoint, backend, method, rtol, atol,
                       step_size, max_steps, return_stats, jump_t,
                       adjoint_rtol, adjoint_atol, adjoint_method,
                       adjoint_step_size, adjoint_params, adjoint_max_steps):
    """``options={'per_sample': True}``: vmap one single-sample adaptive solve
    over the flattened batch, so each sample runs its own error norm, PI
    controller and acceptance sequence (the design of torchode,
    arxiv 2210.12375; torchdiffeq couples the whole batch through one RMS
    norm).  Under jit the lanes execute in lockstep SIMD — wall-clock is the
    slowest sample's step count, but no sample is forced to another's step
    size, so the total work is the sum of per-sample NFEs rather than
    batch × worst-case.

    Constraints: adaptive methods only (fixed-step methods have nothing
    per-sample to control), tensor state with at least one batch dimension,
    and the vector field must follow the documented broadcasting contract
    (``f(t, z)`` with z (..., hidden) for *any* leading batch shape,
    including none — each lane calls it unbatched).  With ``return_stats``,
    every statistic gains a leading flattened-batch axis (per-sample NFE /
    step counts).  ``adjoint_params`` identity-matching does not survive the
    per-lane slicing; gradients fall back to the full closure superset.
    """
    if method in _FIXED_METHODS or step_size is not None:
        raise ValueError(
            "options={'per_sample': True} requires an adaptive method "
            f"(got method={method!r}"
            + (", step_size set" if step_size is not None else "")
            + "): fixed-step solves have no per-sample step control."
        )
    if isinstance(z0, tuple) or jnp.ndim(z0) < 2:
        raise ValueError(
            "options={'per_sample': True} needs a tensor state with at least "
            "one batch dimension (z0 of shape (..., hidden_channels))."
        )
    z0 = jnp.asarray(z0)
    batch_shape = z0.shape[:-1]
    batch = int(np.prod(batch_shape))

    def _flat(leaf):
        if getattr(leaf, "ndim", 0) >= 3:
            return jnp.reshape(leaf, (-1,) + leaf.shape[-2:])
        return leaf

    Xf = jax.tree_util.tree_map(_flat, X)
    for leaf in jax.tree_util.tree_leaves(Xf):
        if getattr(leaf, "ndim", 0) >= 3 and leaf.shape[0] != batch:
            raise ValueError(
                "per_sample: the control's batch dimensions "
                f"(flattened size {leaf.shape[0]}) must match the state's "
                f"(flattened size {batch})."
            )
    axes = jax.tree_util.tree_map(
        lambda leaf: 0 if getattr(leaf, "ndim", 0) >= 3 else None, Xf
    )
    z0f = jnp.reshape(z0, (batch, z0.shape[-1]))

    # Per-sample output/integration spans: t (..., n_times) maps one row of
    # times to each lane (torchode's t_eval); a shared 1-D t is closed over.
    t_axis = None
    if jnp.ndim(t) > 1:
        t = jnp.reshape(jnp.asarray(t), (-1, jnp.shape(t)[-1]))
        if t.shape[0] != batch:
            raise ValueError(
                "per_sample: batched output times must have the state's "
                f"batch dimensions (flattened size {t.shape[0]} vs {batch})."
            )
        if is_concrete(t):
            # Every lane's row must be valid: a non-increasing row would
            # otherwise exit the adaptive loop immediately and silently
            # return the initial state for that lane.
            if not bool(np.all(np.diff(np.asarray(t), axis=-1) > 0)):
                raise ValueError("t must be monotonically increasing.")
        t_axis = 0

    # Fused per-lane kernel (solvers/fused_dopri_persample.py): the whole
    # per-sample controlled integration in one Pallas program — per-lane
    # t/dt/accept as lane vectors — instead of a vmap of per-stage XLA
    # dispatches.  Serves adjoint=True too when the adjoint tolerances
    # mirror the forward's (its frozen-mesh exact-reverse gradients are
    # within the adjoint's memory contract, like the whole-batch kernels),
    # and batched per-lane output times (the rows become per-lane VMEM
    # vectors in the kernel).  Declines (None) off-TPU, for non-dopri5
    # methods, jump_t, or stats collection.
    if (method == "dopri5" and jump_t is None
            and not return_stats and step_size is None
            and (not adjoint
                 or (adjoint_params is None and adjoint_method == method
                     and adjoint_rtol == rtol and adjoint_atol == atol
                     and adjoint_step_size is None))):
        from .fused_dopri_persample import try_fused_dopri5_per_sample

        out = try_fused_dopri5_per_sample(
            Xf, func, z0f, t if t_axis is None else None,
            rtol=rtol, atol=atol, max_steps=max_steps,
            t_rows=t if t_axis == 0 else None)
        if out is not None:
            out = jnp.moveaxis(out, 0, -2)  # (B, len(t), H)
            return jax.tree_util.tree_map(
                lambda o: jnp.reshape(o, batch_shape + o.shape[1:]), out
            )

    if adjoint:
        if return_stats:
            raise ValueError(
                "return_stats=True requires adjoint=False (solver statistics "
                "are collected on the direct path)."
            )
        out = _per_sample_adjoint(
            Xf, func, z0f, t, t_axis, method=method, rtol=rtol, atol=atol,
            max_steps=max_steps, jump_t=jump_t, adjoint_rtol=adjoint_rtol,
            adjoint_atol=adjoint_atol, adjoint_method=adjoint_method,
            adjoint_step_size=adjoint_step_size, adjoint_params=adjoint_params,
            adjoint_max_steps=adjoint_max_steps,
        )
        out = jnp.moveaxis(out, 1, -2)  # per-lane time axis leads after vmap
    else:
        inner_kwargs = dict(
            rtol=rtol, atol=atol, method=method, max_steps=max_steps,
            return_stats=return_stats,
        )
        if jump_t is not None:
            inner_kwargs["options"] = dict(jump_t=jump_t)

        def one(X1, z01, t1):
            return cdeint(X1, func, z01, t1, adjoint=False, backend=backend,
                          **inner_kwargs)

        # The Pallas fast paths are single-device whole-batch kernels; under
        # the per-lane vmap the XLA solver paths are the right formulation.
        # Trace-scoped, thread-local: a user's force_fused_pallas(True)
        # survives, and concurrent traces in other threads are unaffected.
        from .fused_pallas import disable_fused_dispatch

        with disable_fused_dispatch():
            out = jax.vmap(one, in_axes=(axes, 0, t_axis))(Xf, z0f, t)

    stats = None
    if return_stats:
        out, stats = out
        # Per-sample counters mirror the output's batch shape.
        stats = jax.tree_util.tree_map(
            lambda s: jnp.reshape(s, batch_shape + s.shape[1:]), stats
        )
    out = jax.tree_util.tree_map(
        lambda o: jnp.reshape(o, batch_shape + o.shape[1:]), out
    )
    if return_stats:
        return out, stats
    return out


def _per_sample_adjoint(Xf, func, z0f, t, t_axis, *, method, rtol, atol,
                        max_steps, jump_t, adjoint_rtol, adjoint_atol,
                        adjoint_method, adjoint_step_size, adjoint_params,
                        adjoint_max_steps):
    """Per-sample solve with the continuous-backsolve adjoint.

    The closure conversion must happen OUTSIDE the per-lane vmap: converting
    inside would bake that trace's batch tracers into the hoisted jaxpr,
    which the custom_vjp backward then re-evaluates after the trace is gone
    (UnexpectedTracerError).  So the vector field's closure is hoisted once
    on a reference lane, each hoisted constant is matched back (by identity,
    the convention of cdeint's adjoint_params handling) to its full-batch
    array, and the vmap maps the constants explicitly through
    ``odeint_adjoint``'s pure-function interface."""
    knots_hint = _knots_hint_of(Xf)
    cfg = SolverConfig(method=method, rtol=rtol, atol=atol, step_size=None,
                       max_steps=max_steps, knots_hint=knots_hint)
    adjoint_max_steps = _derive_fixed_adjoint_max_steps(
        adjoint_max_steps, adjoint_method, adjoint_step_size, t)
    adjoint_cfg = SolverConfig(
        method=adjoint_method, rtol=adjoint_rtol, atol=adjoint_atol,
        step_size=adjoint_step_size, max_steps=adjoint_max_steps,
        knots_hint=knots_hint,
    )

    # The control's leaves become EXPLICIT consts (so per-lane data is a real
    # vmapped argument and coefficient gradients flow even in eager mode —
    # closure_convert hoists nothing outside a trace, baking closures as
    # constants); only the vector field's residual closure (its parameters)
    # goes through closure_convert, where traced entries are hoisted and
    # shared across lanes (axis None).
    xleaves, xdef = jax.tree_util.tree_flatten(Xf)
    # Rebuilt from the leaves (not tree_leaves(axes): None entries vanish
    # from pytree flattening).
    xaxes = [0 if getattr(l, "ndim", 0) >= 3 else None for l in xleaves]
    nx = len(xleaves)

    def rhs_x(tt, z, xl):
        X1 = jax.tree_util.tree_unflatten(xdef, xl)
        return make_cde_rhs(func, X1)(tt, z)

    x0 = [l[0] if a == 0 else l for l, a in zip(xleaves, xaxes)]
    t0 = jnp.asarray(t).reshape(-1)[0]
    rhs_conv, extra = jax.closure_convert(rhs_x, t0, z0f[0], x0)
    extra = list(extra)
    consts = list(xleaves) + extra
    const_axes = list(xaxes) + [None] * len(extra)

    grad_mask = _match_adjoint_params(adjoint_params, consts)

    def one(cs, z01, t1):
        return odeint_adjoint(
            lambda s, z, c: rhs_conv(s, z, c[:nx], *c[nx:]), list(cs), z01, t1,
            cfg, adjoint_cfg, jump_t, grad_mask=grad_mask,
        )

    return jax.vmap(one, in_axes=(const_axes, 0, t_axis))(consts, z0f, t)
