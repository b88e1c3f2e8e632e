"""Explicit Runge–Kutta steppers over pytree state.

Native replacements for the torchdiffeq solvers consumed at
/root/reference/torchcde/solver.py:226-227 (euler, midpoint, rk4, dopri5) and
the torchsde reversible Heun (reference README.md:105).  Steppers are pure
functions of (rhs, t, z, dt, state); tableaus are NumPy constants so they bake
into the jitted program instead of being hoisted as device buffers.
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def tree_add(x, y):
    return jax.tree_util.tree_map(jnp.add, x, y)


def tree_sub(x, y):
    return jax.tree_util.tree_map(jnp.subtract, x, y)


def tree_scale(a, x):
    return jax.tree_util.tree_map(lambda xi: a * xi, x)


def tree_axpy(a, x, y):
    """y + a * x over pytrees; a is a scalar."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


def tree_select(pred, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: jnp.where(pred, xi, yi), x, y)


def _weighted_sum(coeffs, ks):
    """sum_i coeffs[i] * ks[i] over pytrees, skipping exact zeros."""
    total = None
    for c, k in zip(coeffs, ks):
        if c == 0.0:
            continue
        term = tree_scale(c, k)
        total = term if total is None else tree_add(total, term)
    if total is None:
        total = tree_scale(0.0, ks[0])
    return total


class ButcherTableau(NamedTuple):
    alpha: tuple  # c_2..c_s
    beta: tuple  # rows of the (strictly lower triangular) A matrix
    c_sol: tuple  # b
    c_error: Optional[tuple]  # b - b_hat, or None for fixed-step methods
    order: int  # used as the step-controller exponent order


EULER = ButcherTableau(alpha=(), beta=(), c_sol=(1.0,), c_error=None, order=1)

MIDPOINT = ButcherTableau(
    alpha=(0.5,), beta=((0.5,),), c_sol=(0.0, 1.0), c_error=None, order=2
)

HEUN = ButcherTableau(
    alpha=(1.0,), beta=((1.0,),), c_sol=(0.5, 0.5), c_error=None, order=2
)

# Heun's third-order method (torchdiffeq's fixed-grid "heun3").
HEUN3 = ButcherTableau(
    alpha=(1 / 3, 2 / 3),
    beta=((1 / 3,), (0.0, 2 / 3)),
    c_sol=(0.25, 0.0, 0.75),
    c_error=None,
    order=3,
)

RK4 = ButcherTableau(
    alpha=(0.5, 0.5, 1.0),
    beta=((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
    c_sol=(1 / 6, 1 / 3, 1 / 3, 1 / 6),
    c_error=None,
    order=4,
)

_BOSH3_B = (2 / 9, 1 / 3, 4 / 9, 0.0)
_BOSH3_BHAT = (7 / 24, 1 / 4, 1 / 3, 1 / 8)

BOSH3 = ButcherTableau(
    alpha=(1 / 2, 3 / 4, 1.0),
    beta=((1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
    c_sol=_BOSH3_B,
    c_error=tuple(b - bh for b, bh in zip(_BOSH3_B, _BOSH3_BHAT)),
    order=3,
)

_DOPRI5_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DOPRI5_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40)

DOPRI5 = ButcherTableau(
    alpha=(1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    beta=(
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    c_sol=_DOPRI5_B,
    c_error=tuple(b - b4 for b, b4 in zip(_DOPRI5_B, _DOPRI5_B4)),
    order=5,
)


# Heun–Euler 2(1): the trapezoidal step with the Euler step as the embedded
# error reference (torchdiffeq's "adaptive_heun" capability consumed through
# the reference's method= passthrough, solver.py:226-227).
_AHEUN_B = (0.5, 0.5)
_AHEUN_BHAT = (1.0, 0.0)

ADAPTIVE_HEUN = ButcherTableau(
    alpha=(1.0,),
    beta=((1.0,),),
    c_sol=_AHEUN_B,
    c_error=tuple(b - bh for b, bh in zip(_AHEUN_B, _AHEUN_BHAT)),
    order=2,
)

# Fehlberg's RK1(2) pair (the "fehlberg2" torchdiffeq method name).
_FEHLBERG2_B = (1 / 256, 255 / 256, 0.0)
_FEHLBERG2_BHAT = (1 / 512, 255 / 256, 1 / 512)

FEHLBERG2 = ButcherTableau(
    alpha=(1 / 2, 1.0),
    beta=((1 / 2,), (1 / 256, 255 / 256)),
    c_sol=_FEHLBERG2_B,
    c_error=tuple(b - bh for b, bh in zip(_FEHLBERG2_B, _FEHLBERG2_BHAT)),
    order=2,
)

# Prince–Dormand RK8(7)13M — the 13-stage 8th-order pair behind torchdiffeq's
# "dopri8" (published constants: Prince & Dormand 1981, "High order embedded
# Runge-Kutta formulae").  Validated in tests by row-sum identities and an
# observed-order-8 convergence measurement (tests/test_solver_extras.py).
_DOPRI8_B = (
    14005451 / 335480064, 0.0, 0.0, 0.0, 0.0, -59238493 / 1068277825,
    181606767 / 758867731, 561292985 / 797845732, -1041891430 / 1371343529,
    760417239 / 1151165299, 118820643 / 751138087, -528747749 / 2220607170,
    1 / 4,
)
_DOPRI8_BHAT = (
    13451932 / 455176623, 0.0, 0.0, 0.0, 0.0, -808719846 / 976000145,
    1757004468 / 5645159321, 656045339 / 265891186, -3867574721 / 1518517206,
    465885868 / 322736535, 53011238 / 667516719, 2 / 45, 0.0,
)

DOPRI8 = ButcherTableau(
    alpha=(
        1 / 18, 1 / 12, 1 / 8, 5 / 16, 3 / 8, 59 / 400, 93 / 200,
        5490023248 / 9719169821, 13 / 20, 1201146811 / 1299019798, 1.0, 1.0,
    ),
    beta=(
        (1 / 18,),
        (1 / 48, 1 / 16),
        (1 / 32, 0.0, 3 / 32),
        (5 / 16, 0.0, -75 / 64, 75 / 64),
        (3 / 80, 0.0, 0.0, 3 / 16, 3 / 20),
        (29443841 / 614563906, 0.0, 0.0, 77736538 / 692538347,
         -28693883 / 1125000000, 23124283 / 1800000000),
        (16016141 / 946692911, 0.0, 0.0, 61564180 / 158732637,
         22789713 / 633445777, 545815736 / 2771057229, -180193667 / 1043307555),
        (39632708 / 573591083, 0.0, 0.0, -433636366 / 683701615,
         -421739975 / 2616292301, 100302831 / 723423059, 790204164 / 839813087,
         800635310 / 3783071287),
        (246121993 / 1340847787, 0.0, 0.0, -37695042795 / 15268766246,
         -309121744 / 1061227803, -12992083 / 490766935, 6005943493 / 2108947869,
         393006217 / 1396673457, 123872331 / 1001029789),
        (-1028468189 / 846180014, 0.0, 0.0, 8478235783 / 508512852,
         1311729495 / 1432422823, -10304129995 / 1701304382,
         -48777925059 / 3047939560, 15336726248 / 1032824649,
         -45442868181 / 3398467696, 3065993473 / 597172653),
        (185892177 / 718116043, 0.0, 0.0, -3185094517 / 667107341,
         -477755414 / 1098053517, -703635378 / 230739211, 5731566787 / 1027545527,
         5232866602 / 850066563, -4093664535 / 808688257, 3962137247 / 1805957418,
         65686358 / 487910083),
        (403863854 / 491063109, 0.0, 0.0, -5068492393 / 434740067,
         -411421997 / 543043805, 652783627 / 914296604, 11173962825 / 925320556,
         -13158990841 / 6184727034, 3936647629 / 1978049680, -160528059 / 685178525,
         248638103 / 1413531060, 0.0),
    ),
    c_sol=_DOPRI8_B,
    c_error=tuple(b - bh for b, bh in zip(_DOPRI8_B, _DOPRI8_BHAT)),
    order=8,
)


def rk_step(tableau: ButcherTableau, rhs, t0, z0, dt):
    """One explicit RK step.  Returns (z1, error_estimate_or_None)."""
    ks = [rhs(t0, z0)]
    for alpha_i, beta_i in zip(tableau.alpha, tableau.beta):
        ti = t0 + alpha_i * dt
        zi = tree_axpy(dt, _weighted_sum(beta_i, ks), z0)
        ks.append(rhs(ti, zi))
    z1 = tree_axpy(dt, _weighted_sum(tableau.c_sol, ks), z0)
    err = None
    if tableau.c_error is not None:
        err = tree_scale(dt, _weighted_sum(tableau.c_error, ks))
    return z1, err


def _solve_dense_midpoint(tableau: ButcherTableau):
    """Weights b(1/2) of a 4th-order continuous extension of the tableau.

    A continuous RK extension z(t0 + theta*dt) = z0 + dt * sum_i b_i(theta) k_i
    is 4th-order accurate iff the theta-dependent rooted-tree conditions hold
    through order 4.  Rather than hardcoding anyone's published interpolant we
    solve those eight conditions at theta = 1/2 directly (float64 lstsq; the
    system is consistent for Dormand–Prince-class tableaus).  Returns None if
    the conditions cannot be met, in which case callers fall back to a cubic
    Hermite midpoint.
    """
    s = len(tableau.c_sol)
    c = np.zeros(s)
    c[1 : 1 + len(tableau.alpha)] = tableau.alpha
    A = np.zeros((s, s))
    for i, row in enumerate(tableau.beta):
        A[i + 1, : len(row)] = row
    Ac, Ac2, AAc = A @ c, A @ (c * c), A @ (A @ c)
    M = np.stack([np.ones(s), c, c * c, Ac, c**3, c * Ac, Ac2, AAc])
    th = 0.5
    rhs = np.array([th, th**2 / 2, th**3 / 3, th**3 / 6,
                    th**4 / 4, th**4 / 8, th**4 / 12, th**4 / 24])
    bmid, *_ = np.linalg.lstsq(M, rhs, rcond=None)
    if np.abs(M @ bmid - rhs).max() > 1e-10:
        return None
    return tuple(float(b) for b in bmid)


def _is_fsal(tableau: ButcherTableau) -> bool:
    """True when the last stage is f(t + dt, z1): alpha ends at 1 and the last
    A row equals b, so ks[-1] doubles as the derivative at the step's end."""
    if not tableau.alpha or tableau.alpha[-1] != 1.0:
        return False
    last = tableau.beta[-1]
    return all(
        b == (last[j] if j < len(last) else 0.0) for j, b in enumerate(tableau.c_sol[:-1])
    ) and tableau.c_sol[-1] == 0.0


def _hermite_midpoint(z0, z1, f0, f1, dt):
    """Cubic-Hermite value at theta = 1/2 (3rd-order fallback midpoint)."""
    return jax.tree_util.tree_map(
        lambda a, b, fa, fb: 0.5 * (a + b) + 0.125 * dt * (fa - fb), z0, z1, f0, f1
    )


class Stepper(NamedTuple):
    init: Callable  # (rhs, t0, z0) -> state
    step: Callable  # (rhs, t, z, dt, state) -> (z1, err_or_None, state1)
    order: int
    adaptive: bool
    # (rhs, t, z, dt, state) -> (z1, err, state1, (f0, f1, y_mid)) — the extra
    # triple feeds the quartic dense-output fit in integrate.py.  None when the
    # method cannot expose end-of-step derivatives for free.
    step_dense: Optional[Callable] = None
    # NFE accounting for collect_stats (integrate.py): steady-state rhs
    # evaluations per attempted step, and the evaluations ``init`` performs.
    nfe_per_step: int = 1
    init_nfe: int = 0


def _make_rk_stepper(tableau: ButcherTableau) -> Stepper:
    def init(rhs, t0, z0):
        return None

    def step(rhs, t, z, dt, state):
        z1, err = rk_step(tableau, rhs, t, z, dt)
        return z1, err, None

    step_dense = None
    if tableau.c_error is not None and _is_fsal(tableau):
        bmid = _solve_dense_midpoint(tableau)

        def step_dense(rhs, t, z, dt, state):
            ks = [rhs(t, z)]
            for alpha_i, beta_i in zip(tableau.alpha, tableau.beta):
                zi = tree_axpy(dt, _weighted_sum(beta_i, ks), z)
                ks.append(rhs(t + alpha_i * dt, zi))
            z1 = tree_axpy(dt, _weighted_sum(tableau.c_sol, ks), z)
            err = tree_scale(dt, _weighted_sum(tableau.c_error, ks))
            if bmid is not None:
                y_mid = tree_axpy(dt, _weighted_sum(bmid, ks), z)
            else:
                y_mid = _hermite_midpoint(z, z1, ks[0], ks[-1], dt)
            return z1, err, None, (ks[0], ks[-1], y_mid)

    return Stepper(
        init=init, step=step, order=tableau.order,
        adaptive=tableau.c_error is not None, step_dense=step_dense,
        nfe_per_step=len(tableau.alpha) + 1,
    )


def _make_dopri5_fsal() -> Stepper:
    """Dormand–Prince 5(4) with the first-same-as-last optimisation: the 7th
    stage is f(t + dt, z1) (its A row equals b), so it seeds the next step's
    first stage — 6 evaluations per step instead of 7.  The cached stage
    remains valid across rejections (same (t, z)) and across output-interval
    boundaries; it is NOT valid across derivative discontinuities, so
    integrate.py falls back to the stateless variant when jump_t is given.
    """
    tab = DOPRI5
    bmid = _solve_dense_midpoint(tab)

    def init(rhs, t0, z0):
        return rhs(t0, z0)

    def _stages(rhs, t, z, dt, k1):
        ks = [k1]
        for alpha_i, beta_i in zip(tab.alpha, tab.beta):
            ti = t + alpha_i * dt
            zi = tree_axpy(dt, _weighted_sum(beta_i, ks), z)
            ks.append(rhs(ti, zi))
        z1 = tree_axpy(dt, _weighted_sum(tab.c_sol, ks), z)
        err = tree_scale(dt, _weighted_sum(tab.c_error, ks))
        return ks, z1, err

    def step(rhs, t, z, dt, k1):
        ks, z1, err = _stages(rhs, t, z, dt, k1)
        return z1, err, ks[-1]

    def step_dense(rhs, t, z, dt, k1):
        ks, z1, err = _stages(rhs, t, z, dt, k1)
        if bmid is not None:
            y_mid = tree_axpy(dt, _weighted_sum(bmid, ks), z)
        else:  # pragma: no cover — lstsq residual check platform-dependent
            y_mid = _hermite_midpoint(z, z1, ks[0], ks[-1], dt)
        return z1, err, ks[-1], (ks[0], ks[-1], y_mid)

    return Stepper(init=init, step=step, order=tab.order, adaptive=True,
                   step_dense=step_dense, nfe_per_step=6, init_nfe=1)


def _make_reversible_heun() -> Stepper:
    """Algebraically reversible Heun (Kidger et al. 2021; the torchsde
    capability referenced at reference README.md:105).  Carries the companion
    state (ŷ, f(t, ŷ)); one NFE per step; second order; the update is exactly
    invertible, enabling O(1)-memory reconstruction of the trajectory in the
    backward pass.
    """

    def init(rhs, t0, z0):
        return (z0, rhs(t0, z0))

    def step(rhs, t, z, dt, state):
        yhat, fhat = state
        yhat1 = tree_axpy(dt, fhat, tree_sub(tree_scale(2.0, z), yhat))
        fhat1 = rhs(t + dt, yhat1)
        z1 = tree_axpy(0.5 * dt, tree_add(fhat, fhat1), z)
        # Local error estimate: difference between the Heun solution and the
        # explicit companion — used only if run adaptively.
        err = tree_scale(0.5 * dt, tree_sub(fhat1, fhat))
        return z1, err, (yhat1, fhat1)

    return Stepper(init=init, step=step, order=2, adaptive=False,
                   nfe_per_step=1, init_nfe=1)


def _make_adams_stepper(implicit: bool) -> Stepper:
    """Fixed-step 4th-order Adams multistep methods: Adams–Bashforth
    (torchdiffeq's "explicit_adams") and Adams–Bashforth–Moulton in PECE
    predictor–corrector form ("implicit_adams" / "fixed_adams") — the
    remaining fixed-grid names of the method= passthrough the reference
    forwards to torchdiffeq (/root/reference/torchcde/solver.py:226-227).

    The stepper state carries the derivative history (f_n .. f_{n-3}) and a
    step counter; the first three steps bootstrap with single RK4 steps
    inside a ``lax.cond`` so the bootstrap's extra evaluations are not paid
    once the history is full.  Steady-state cost: 1 NFE/step explicit,
    2 NFE/step implicit — the multistep economy that motivates Adams
    methods.  The constant-step coefficients assume a uniform grid; the
    driver's clamped final step (or a ``step_size`` that does not divide an
    output interval) locally reduces the formal order, the same contract as
    the fixed-grid Adams solvers being replaced.  Note that for CDEs driven
    by spline controls the derivative has kinks at the knots; a multistep
    history that straddles a kink costs local accuracy even when the steps
    themselves land on it, so observed convergence on spline-driven problems
    sits below the smooth-problem order (true of any fixed-grid multistep
    method, including the ones being replaced).
    """
    AB4 = (55 / 24, -59 / 24, 37 / 24, -9 / 24)
    AM4 = (9 / 24, 19 / 24, -5 / 24, 1 / 24)  # on (f_pred, f_n, f_{n-1}, f_{n-2})

    def init(rhs, t0, z0):
        f0 = rhs(t0, z0)
        zero = tree_scale(0.0, f0)
        return (jnp.zeros((), jnp.int32), (f0, zero, zero, zero))

    def step(rhs, t, z, dt, state):
        count, (f0, f1, f2, f3) = state

        def adams(_):
            zp = tree_axpy(dt, _weighted_sum(AB4, (f0, f1, f2, f3)), z)
            if not implicit:
                return zp
            fp = rhs(t + dt, zp)
            return tree_axpy(dt, _weighted_sum(AM4, (fp, f0, f1, f2)), z)

        def bootstrap(_):
            z1, _err = rk_step(RK4, rhs, t, z, dt)
            return z1

        z1 = jax.lax.cond(count >= 3, adams, bootstrap, None)
        f_new = rhs(t + dt, z1)  # the trailing E of PECE; next step's f_n
        return z1, None, (count + 1, (f_new, f0, f1, f2))

    return Stepper(init=init, step=step, order=4, adaptive=False,
                   nfe_per_step=2 if implicit else 1, init_nfe=1)


_ADAMS_EXPLICIT = _make_adams_stepper(implicit=False)
_ADAMS_IMPLICIT = _make_adams_stepper(implicit=True)

STEPPERS = {
    "euler": _make_rk_stepper(EULER),
    "midpoint": _make_rk_stepper(MIDPOINT),
    "heun": _make_rk_stepper(HEUN),
    "heun3": _make_rk_stepper(HEUN3),
    "rk4": _make_rk_stepper(RK4),
    "bosh3": _make_rk_stepper(BOSH3),
    "dopri5": _make_dopri5_fsal(),
    "dopri5_nofsal": _make_rk_stepper(DOPRI5),
    "dopri8": _make_rk_stepper(DOPRI8),
    "adaptive_heun": _make_rk_stepper(ADAPTIVE_HEUN),
    "fehlberg2": _make_rk_stepper(FEHLBERG2),
    "reversible_heun": _make_reversible_heun(),
    "explicit_adams": _ADAMS_EXPLICIT,
    "implicit_adams": _ADAMS_IMPLICIT,
    "fixed_adams": _ADAMS_IMPLICIT,  # torchdiffeq alias for the ABM corrector
}
