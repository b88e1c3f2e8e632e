"""The ODE integration driver.

Native replacement for the torchdiffeq/torchsde delegation at
/root/reference/torchcde/solver.py:224-232.  Fixed-step methods proceed output
interval by output interval (an outer ``lax.scan`` over (ts[i], ts[i+1])) and
hit every output time exactly.  Adaptive methods (dopri5, bosh3) instead run
ONE continuous PI-controlled integration from ts[0] to ts[-1] inside a
bounded, reverse-differentiable while loop; output times are produced from a
4th-order dense-output interpolant of each accepted step (masked vectorised
writes), so the accepted-step sequence — and hence NFE — is independent of
``len(ts)``, matching the torchdiffeq capability the reference consumes.
Solutions carry the time axis leading and ``cdeint`` moves it to
second-to-last (reference solver.py:234-243).

Step counts: when ``ts`` / ``step_size`` are concrete (the overwhelmingly
common case — with default grids the control's times are constants even under
jit, see utils/misc.validate_input_path), the exact number of fixed steps is
computed statically and no masked iterations exist at all.  Otherwise
``max_steps`` bounds the loop and exhausted iterations take the cheap branch
of a scalar ``lax.cond``.
"""

import dataclasses
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import is_concrete
from .loops import bounded_while_loop
from .runge_kutta import STEPPERS, tree_select

_tree_map = jax.tree_util.tree_map

_FIXED_DEFAULT_MAX_STEPS = 65536
_ADAPTIVE_DEFAULT_MAX_STEPS = 4096


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static (hashable) solver configuration.

    The explicit, typed version of the reference's ``**kwargs`` passthrough
    config surface (solver.py:175-176,195-203; README.md:194-200).
    """

    method: str = "dopri5"
    rtol: float = 1e-4
    atol: float = 1e-6
    step_size: Optional[float] = None
    max_steps: Optional[int] = None
    safety: float = 0.9
    ifactor: float = 10.0
    dfactor: float = 0.2
    # Knot count of the control being integrated, when the caller knows it
    # (cdeint sets it from X.grid_points).  Used only to size the DEFAULT
    # adaptive step budget — an explicit ``max_steps`` always wins.
    knots_hint: Optional[int] = None

    def stepper(self):
        if self.method not in STEPPERS:
            raise ValueError(
                f"Unrecognised method={self.method!r}; expected one of {sorted(STEPPERS)}"
            )
        return STEPPERS[self.method]


def _rms_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(jnp.sum(jnp.square(leaf)) for leaf in leaves)
    count = sum(leaf.size for leaf in leaves)
    return jnp.sqrt(total / count)


def _error_ratio(err, rtol, atol, z0, z1):
    scaled = _tree_map(
        lambda e, a, b: e / (atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))), err, z0, z1
    )
    return _rms_norm(scaled)


def _next_jump(jump_t, t):
    """Smallest jump time strictly greater than t (inf if none)."""
    idx = jnp.searchsorted(jump_t, t, side="right")
    padded = jnp.concatenate([jump_t, jnp.full((1,), jnp.inf, dtype=jump_t.dtype)])
    return padded[jnp.minimum(idx, jump_t.shape[0])]


def select_initial_step(rhs, t0, z0, order, rtol, atol, f0):
    """Hairer/Wanner initial step heuristic (as used by torchdiffeq)."""
    scale = _tree_map(lambda z: atol + jnp.abs(z) * rtol, z0)
    d0 = _rms_norm(_tree_map(jnp.divide, z0, scale))
    d1 = _rms_norm(_tree_map(jnp.divide, f0, scale))
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-30))

    z1 = _tree_map(lambda z, f: z + h0 * f, z0, f0)
    f1 = rhs(t0 + h0, z1)
    d2 = _rms_norm(_tree_map(lambda a, b, s: (a - b) / s, f1, f0, scale)) / h0

    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100 * h0, h1)


def _optimal_factor(ratio, order, cfg: SolverConfig, accepted):
    # torchdiffeq-style controller: factor = clip(safety * ratio^(-1/order),
    # dfactor, ifactor); growth is disabled after a rejection.
    ratio = jnp.maximum(ratio, 1e-10)
    factor = cfg.safety * ratio ** (-1.0 / order)
    factor = jnp.where(jnp.isfinite(factor), factor, cfg.dfactor)
    upper = jnp.where(accepted, cfg.ifactor, 1.0)
    return jnp.clip(factor, cfg.dfactor, upper)


def _while(cond, body, init, max_steps, differentiable):
    """Dispatch between the reverse-differentiable bounded loop (direct
    backprop mode) and a plain ``lax.while_loop`` (inside custom_vjp adjoints,
    where XLA never differentiates the loop and masked iterations would be
    pure waste)."""
    if differentiable:
        return bounded_while_loop(cond, body, init, max_steps)

    def cond2(carry):
        count, val = carry
        return cond(val) & (count < max_steps)

    def body2(carry):
        count, val = carry
        return count + 1, body(val)

    return jax.lax.while_loop(cond2, body2, (0, init))[1]


# p(theta) = z0 + dt*f0*theta + c2*theta^2 + c3*theta^3 + c4*theta^4 with
# p(1) = z1, p'(1) = dt*f1, p(1/2) = y_mid: the 3x3 system for (c4, c3, c2)
# is the same for every step, so its inverse is a compile-time constant.
_QUARTIC_MINV = np.linalg.inv(
    np.array([[1.0, 1.0, 1.0], [4.0, 3.0, 2.0], [1 / 16, 1 / 8, 1 / 4]])
)


def _interp_quartic(z0, z1, f0, f1, y_mid, dt, theta):
    """Evaluate the quartic dense-output polynomial at every theta (1-D array);
    leaf results gain a leading len(theta) axis."""
    # Python floats stay weakly typed: NumPy f64 scalars would promote f32
    # state to f64 under jax_enable_x64 and break loop-carry type invariance.
    m = [[float(v) for v in row] for row in _QUARTIC_MINV]

    def leaf(z0l, z1l, f0l, f1l, yml):
        th = theta.reshape(theta.shape + (1,) * z0l.ndim).astype(z0l.dtype)
        rA = z1l - z0l - dt * f0l
        rB = dt * (f1l - f0l)
        rC = yml - z0l - 0.5 * dt * f0l
        c4 = m[0][0] * rA + m[0][1] * rB + m[0][2] * rC
        c3 = m[1][0] * rA + m[1][1] * rB + m[1][2] * rC
        c2 = m[2][0] * rA + m[2][1] * rB + m[2][2] * rC
        return z0l + th * (dt * f0l + th * (c2 + th * (c3 + th * c4)))

    return _tree_map(leaf, z0, z1, f0, f1, y_mid)


def _integrate_adaptive_dense(rhs, z0, ts, dt0, state0, cfg, stepper, max_steps,
                              jump_t, differentiable):
    """One continuous adaptive solve over [ts[0], ts[-1]] with dense output.

    Each accepted step writes the 4th-order interpolant into every output row
    whose time falls inside (t, t + dt]; the controller never clamps to output
    times (only to ts[-1] and to jump_t discontinuities), so NFE does not grow
    with len(ts).  Returns (out, (attempted, accepted)) with out time-leading.
    """
    t_end = ts[-1]
    n_out = ts.shape[0]
    dt0 = jax.lax.stop_gradient(dt0)  # initial-step heuristic: mesh, not value
    out0 = _tree_map(lambda z: jnp.broadcast_to(z[None], (n_out,) + z.shape), z0)

    def cond(carry):
        t = carry[0]
        return t < t_end

    def body(carry):
        t, z, dt, state, counts, out = carry
        attempted, accepted_n = counts
        dt = jnp.maximum(dt, 1e-14)
        dt_clamped = jnp.minimum(dt, t_end - t)
        if jump_t is not None:
            # Land exactly on derivative discontinuities (the torchdiffeq
            # options={'jump_t': ...} capability, reference README.md:240-249).
            dt_clamped = jnp.minimum(dt_clamped, _next_jump(jump_t, t) - t)
        if stepper.order > 5:
            # The shared dense-output interpolant is quartic — the standard
            # companion for dopri5 (its O(h^5) interpolation error matches
            # the method's local error; torchdiffeq ships the same pairing)
            # and more than enough for order <= 3 methods, but for dopri8 a
            # mid-step readout would silently degrade the solution to 4th
            # order.  For such methods clamp steps to land exactly on
            # output times instead — every emitted row is then an exact
            # solver state at full method order (theta == 1, where the
            # quartic reproduces z1 identically), costing at most len(ts)
            # extra step boundaries rather than extra stage evaluations.
            # (was_clamped below already preserves the dt proposal.)
            dt_clamped = jnp.minimum(dt_clamped, _next_jump(ts, t) - t)
        # Freeze the step sequence for reverse AD: differentiating through the
        # controller (err -> dt -> z) injects the solver's non-smooth
        # step-selection noise into otherwise-smooth gradients (measured 100x
        # off the frozen-mesh/adjoint gradient on mildly sensitive problems).
        # Gradients are those of the scheme on the realised mesh; output-time
        # sensitivities still flow through the interpolant's theta below.
        dt_clamped = jax.lax.stop_gradient(dt_clamped)
        z1, err, state1, (f0, f1, y_mid) = stepper.step_dense(rhs, t, z, dt_clamped, state)
        ratio = jax.lax.stop_gradient(_error_ratio(err, cfg.rtol, cfg.atol, z, z1))
        accept = ratio <= 1.0
        t_new = jnp.where(accept, t + dt_clamped, t)
        z_new = tree_select(accept, z1, z)
        state_new = tree_select(accept, state1, state)
        dt_new = dt_clamped * _optimal_factor(ratio, stepper.order, cfg, accept)
        # If the step was only short because it was clamped to the interval
        # end (or a jump), don't let that shrink the carried proposal.
        was_clamped = dt_clamped < dt
        dt_new = jnp.where(accept & was_clamped, jnp.maximum(dt, dt_new), dt_new)
        emit = accept & (ts > t) & (ts <= t + dt_clamped)
        theta = jnp.clip((ts - t) / jnp.maximum(dt_clamped, 1e-30), 0.0, 1.0)
        vals = _interp_quartic(z, z1, f0, f1, y_mid, dt_clamped, theta)
        out = _tree_map(
            lambda o, v: jnp.where(emit.reshape(emit.shape + (1,) * (o.ndim - 1)), v, o),
            out, vals,
        )
        counts = (attempted + 1, accepted_n + accept.astype(jnp.int32))
        return (t_new, z_new, dt_new, state_new, counts, out)

    zero = jnp.zeros((), jnp.int32)
    carry = (ts[0], z0, dt0, state0, (zero, zero), out0)
    final = _while(cond, body, carry, max_steps, differentiable)
    # Loud exhaustion: the loop exits with t >= t_end iff it converged (the
    # cond guarantees it), so t < t_end here means the step budget ran out
    # mid-solve.  Poison the outputs with NaN instead of returning the
    # silently-truncated trajectory — the jit-compatible form of
    # torchdiffeq's max_num_steps RuntimeError.
    incomplete = final[0] < t_end
    out = _tree_map(
        lambda o: jnp.where(incomplete, jnp.full_like(o, jnp.nan), o), final[5]
    )
    return out, final[4]


def _advance_adaptive(rhs, z0, t0, t1, dt0, state0, cfg, stepper, max_steps, jump_t,
                      differentiable):
    """Adaptive stepping from t0 to exactly t1.  Returns (z1, dt_next, state1)."""

    def cond(carry):
        t, _z, _dt, _state, _counts = carry
        return t < t1

    def body(carry):
        t, z, dt, state, counts = carry
        attempted, accepted_n = counts
        # Freeze the controller for reverse AD, exactly like the dense-output
        # loop above: the step-size proposal is mesh, not value (its gradient
        # is the solver's non-smooth step-selection noise and explodes over
        # many steps).  The t1 - t clamp stays differentiable so output-time
        # sensitivity flows through the final step of each interval.
        dt = jax.lax.stop_gradient(jnp.maximum(dt, 1e-14))
        dt_clamped = jnp.minimum(dt, t1 - t)
        if jump_t is not None:
            # Land exactly on derivative discontinuities (the torchdiffeq
            # options={'jump_t': ...} capability, reference README.md:240-249).
            dt_clamped = jnp.minimum(dt_clamped, _next_jump(jump_t, t) - t)
        z1, err, state1 = stepper.step(rhs, t, z, dt_clamped, state)
        ratio = jax.lax.stop_gradient(_error_ratio(err, cfg.rtol, cfg.atol, z, z1))
        accept = ratio <= 1.0
        t_new = jnp.where(accept, t + dt_clamped, t)
        z_new = tree_select(accept, z1, z)
        state_new = tree_select(accept, state1, state)
        dt_new = dt_clamped * _optimal_factor(ratio, stepper.order, cfg, accept)
        # If the step was only short because it was clamped to the interval
        # end (or a jump), don't let that shrink the carried proposal.
        was_clamped = dt_clamped < dt
        dt_new = jnp.where(accept & was_clamped, jnp.maximum(dt, dt_new), dt_new)
        counts = (attempted + 1, accepted_n + accept.astype(jnp.int32))
        return (t_new, z_new, dt_new, state_new, counts)

    zero = jnp.zeros((), jnp.int32)
    _t, z_final, dt_final, state_final, counts = _while(
        cond, body, (t0, z0, dt0, state0, (zero, zero)), max_steps, differentiable
    )
    # Loud exhaustion (see _integrate_adaptive_dense): budget ran out iff the
    # loop exited with t still short of t1 — poison with NaN rather than
    # return a silently-truncated state.
    incomplete = _t < t1
    z_final = _tree_map(
        lambda z: jnp.where(incomplete, jnp.full_like(z, jnp.nan), z), z_final
    )
    return z_final, dt_final, state_final, counts


def _advance_fixed(rhs, z0, t0, t1, step_size, state0, stepper, max_steps,
                   differentiable, exact_bound=True):
    """Fixed steps of ``step_size`` (last step clamped) from t0 to exactly t1."""

    if state0 is None:
        # State-free (plain RK) steppers: a straight lax.scan with dt clamped
        # to [0, t1 - t].  Padding iterations (dt = 0) are exact identities
        # (z1 = z + 0 * ...), so no cond/while bookkeeping is needed — the
        # cheapest possible loop for the hot fixed-step path.  Only dt > 0
        # iterations count as steps (padding is an artifact of the bound).
        # When the bound is exact (concrete ts: the common case) there is no
        # padding and the body stays branch-free; a loose bound (traced ts
        # falls back to a large default) guards the RK body behind a scalar
        # cond so exhausted iterations don't pay real rhs evaluations.
        def real_step(args):
            t, z, dt = args
            z1, _err, _state = stepper.step(rhs, t, z, dt, None)
            return z1

        def body(carry, _):
            t, z, n = carry
            dt = jnp.clip(t1 - t, 0.0, step_size)
            if exact_bound:
                z1 = real_step((t, z, dt))
            else:
                z1 = jax.lax.cond(dt > 0, real_step, lambda a: a[1], (t, z, dt))
            return (t + dt, z1, n + (dt > 0).astype(jnp.int32)), None

        (_t, z_final, n_steps), _ = jax.lax.scan(
            body, (t0, z0, jnp.zeros((), jnp.int32)), None, length=max_steps
        )
        return z_final, None, n_steps

    def cond(carry):
        t, _z, _state, _n = carry
        return t < t1

    def body(carry):
        t, z, state, n = carry
        dt = jnp.minimum(step_size, t1 - t)
        z1, _err, state1 = stepper.step(rhs, t, z, dt, state)
        return (t + dt, z1, state1, n + 1)

    _t, z_final, state_final, n_steps = _while(
        cond, body, (t0, z0, state0, jnp.zeros((), jnp.int32)), max_steps, differentiable
    )
    return z_final, state_final, n_steps


def _static_fixed_steps(ts, step_size):
    """Exact per-interval step bound when everything is concrete, else None."""
    if step_size is None:
        return 1
    if not is_concrete(ts):
        return None
    tv = np.asarray(ts, dtype=np.float64)
    intervals = np.diff(tv)
    if intervals.size == 0:  # single output time: nothing to integrate
        return 1
    n = int(np.max(np.ceil(intervals / float(step_size) - 1e-9)))
    return max(n, 1)


def odeint(rhs, z0, ts, cfg: SolverConfig, jump_t=None, differentiable=True,
           collect_stats=False):
    """Integrates dz/dt = rhs(t, z) from ts[0], returning z at every ts[i].

    Output pytree leaves have the time axis *leading*: (len(ts), ...).
    Set ``differentiable=False`` inside custom_vjp adjoints: the step loops
    become plain while loops with no reverse-AD bookkeeping.

    With ``collect_stats=True`` returns ``(out, stats)`` where stats carries
    step/NFE counters (the observability torchdiffeq keeps internally but the
    reference never exposes — SURVEY.md section 5).
    """
    # The solve runs in the state's precision: f64 times against an f32 state
    # would promote the loop carry mid-body (a type-stability crash in the
    # bounded differentiable loops).  Concrete NumPy grids stay concrete so
    # step counts remain static.
    state_dtype = jnp.result_type(*jax.tree_util.tree_leaves(z0))
    if jnp.issubdtype(state_dtype, jnp.floating):
        if isinstance(ts, np.ndarray):
            ts = ts.astype(state_dtype)
        elif getattr(ts, "dtype", None) != state_dtype:
            ts = jnp.asarray(ts, state_dtype)

    # Non-increasing ts would exit the adaptive loop immediately and return
    # z0 at every output time with no error OR NaN (the exhaustion guard
    # compares against ts[-1], which would be behind ts[0]) — validate
    # loudly while concrete.  Traced ts are the caller's contract.
    if is_concrete(ts):
        tv = np.asarray(ts)
        if tv.shape[0] > 1 and not bool(np.all(np.diff(tv) > 0)):
            raise ValueError("t must be monotonically increasing.")
    if jump_t is not None:
        # _next_jump searchsorts this array; the backward pass sorts its
        # negated copy (adjoint.py), so sort here too or the forward mesh
        # silently straddles declared kinks an unsorted caller list hides.
        jump_t = jnp.sort(jnp.asarray(jump_t))

    stepper = cfg.stepper()
    if cfg.method == "dopri5" and jump_t is not None:
        # The FSAL cache is invalid across derivative discontinuities.
        stepper = STEPPERS["dopri5_nofsal"]
    state0 = stepper.init(rhs, ts[0], z0)
    # NFE accounting lives on the Stepper (runge_kutta.py), so a new method
    # cannot silently report wrong statistics; the dopri5 -> dopri5_nofsal
    # swap above already carries the right counts.
    stages = stepper.nfe_per_step
    init_nfe = stepper.init_nfe

    if stepper.adaptive and cfg.step_size is None:
        f0 = rhs(ts[0], z0)
        dt0 = select_initial_step(rhs, ts[0], z0, stepper.order, cfg.rtol, cfg.atol, f0)
        init_nfe += 2  # initial-step-size heuristic
        # Low-order adaptive methods take ~tol^(-1/(order+1)) steps — a flat
        # budget sized for dopri5 silently truncates them.  The budget is
        # cheap to over-provision in the plain while loop (stops at the
        # realised count), but with ``differentiable=True`` every budgeted
        # iteration is executed and checkpointed, so the default is derived
        # from the problem when the knot count is known: adaptive CDE solves
        # track the control's knots on smooth problems, but the realised
        # count is ultimately set by the *dynamics* (a wiggly vector field
        # can need 15+ steps/knot even at the default tolerances), and grows
        # like tol^(-1/(order+1)) as tolerances tighten.  8 steps/knot x the
        # tolerance factor with a 1024 floor compiles a loop near the
        # realised count for the knot-dominated regime while leaving real
        # headroom for dynamics-dominated solves — and exhaustion is LOUD
        # (NaN-poisoned output, see the adaptive drivers), never a silently
        # truncated trajectory, so an undersized budget is detectable and
        # fixable via an explicit max_steps.  The heuristic applies to the
        # high-order methods (dopri5/dopri8); low-order steppers' counts
        # blow up much faster with tolerance, so they keep the flat
        # (order-scaled) budget.  An explicit max_steps always wins, and
        # the derived default never exceeds the flat one.
        order_scale = 8 if stepper.order < 3 else 1
        default_steps = _ADAPTIVE_DEFAULT_MAX_STEPS
        if (differentiable and stepper.order >= 4
                and cfg.max_steps is None and cfg.knots_hint is not None):
            inv_order = 1.0 / (stepper.order + 1)
            tol_scale = max(
                1.0,
                (1e-4 / max(cfg.rtol, 1e-30)) ** inv_order,
                (1e-6 / max(cfg.atol, 1e-30)) ** inv_order,
            )
            default_steps = int(
                min(default_steps, max(1024, 8 * cfg.knots_hint * tol_scale))
            )
        max_steps = cfg.max_steps or (default_steps * order_scale)

        if stepper.step_dense is not None:
            # Continuous solve + dense output: NFE independent of len(ts).
            out, (attempted, accepted) = _integrate_adaptive_dense(
                rhs, z0, jnp.asarray(ts), dt0, state0, cfg, stepper, max_steps,
                jump_t, differentiable,
            )
            if not collect_stats:
                return out
            return out, {
                "steps_attempted": attempted,
                "steps_accepted": accepted,
                "steps_rejected": attempted - accepted,
                "nfe": init_nfe + attempted * stages,
            }

        # Adaptive stepper without a dense-output form: restart at every
        # output time (the pre-dense fallback; exact but NFE grows with
        # len(ts)).
        def advance(z, t0, t1, dt, state):
            return _advance_adaptive(
                rhs, z, t0, t1, dt, state, cfg, stepper, max_steps, jump_t,
                differentiable,
            )

    else:
        # Fixed-step mode; with no step_size, one step per output interval
        # (torchdiffeq's default grid for fixed solvers is ``t`` itself).
        if jump_t is not None:
            # Loud, like the other unsupported-kwarg warnings (cdeint.py):
            # silently straddling declared kinks burnt users of the
            # reference's linear-interpolation recipe (README.md:194-199).
            warnings.warn(
                "options={'jump_t': ...} is ignored by fixed-step methods "
                "(and by adaptive methods run with an explicit step_size): "
                "steps may straddle the declared derivative discontinuities. "
                "Use an adaptive method without step_size, or choose a "
                "step_size that divides the jump times."
            )
        n_static = _static_fixed_steps(ts, cfg.step_size)
        exact_bound = n_static is not None
        if n_static is None:
            # Traced `t`: the per-interval step count is data-dependent, so
            # fall back to a bounded masked loop (exhausted iterations take
            # the cheap cond branch).
            n_static = cfg.max_steps or (
                _ADAPTIVE_DEFAULT_MAX_STEPS if differentiable else _FIXED_DEFAULT_MAX_STEPS
            )
        else:
            n_static = min(n_static, cfg.max_steps or _FIXED_DEFAULT_MAX_STEPS)
        dt0 = jnp.zeros((), dtype=jnp.result_type(ts.dtype))

        def advance(z, t0, t1, dt, state):
            step_size = cfg.step_size if cfg.step_size is not None else (t1 - t0)
            z1, state1, n = _advance_fixed(
                rhs, z, t0, t1, step_size, state, stepper, n_static,
                differentiable, exact_bound=exact_bound
            )
            return z1, dt, state1, (n, n)

    def outer(carry, t_pair):
        z, dt, state, counts = carry
        t0, t1 = t_pair
        z1, dt1, state1, (attempted, accepted) = advance(z, t0, t1, dt, state)
        counts = (counts[0] + attempted, counts[1] + accepted)
        return (z1, dt1, state1, counts), z1

    zero = jnp.zeros((), jnp.int32)
    (_, _, _, counts), zs = jax.lax.scan(
        outer, (z0, dt0, state0, (zero, zero)), (jnp.asarray(ts[:-1]), jnp.asarray(ts[1:]))
    )
    out = _tree_map(lambda z0i, zsi: jnp.concatenate([z0i[None], zsi], axis=0), z0, zs)
    if not collect_stats:
        return out
    attempted, accepted = counts
    stats = {
        "steps_attempted": attempted,
        "steps_accepted": accepted,
        "steps_rejected": attempted - accepted,
        "nfe": init_nfe + attempted * stages,
    }
    return out, stats
