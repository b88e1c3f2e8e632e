"""Regression locks for latent solver-core defects found in review.

Each case pins one fix:

- non-increasing concrete output grids raise instead of silently returning
  z0 at every output time (the adaptive exhaustion guard compares against
  ts[-1], which sat *behind* ts[0]);
- unsorted ``jump_t`` lists behave exactly like sorted ones (the forward
  searchsorted the caller's raw list while the backward sorted its copy);
- single-output-time grids do not crash the static step-bound computation;
- traced output times still produce correct fixed-step results (the padded
  scan iterations are guarded by a cond instead of paying rhs evaluations);
- the scan-over-intervals reversible Heun forward (one rhs evaluation per
  step, cache carried across intervals) agrees with the generic stepper
  path to fp exactness;
- NFE statistics follow each Stepper's declared ``nfe_per_step``/``init_nfe``
  so newly added methods cannot silently misreport.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchcde_tpu.solvers.integrate import SolverConfig, odeint
from torchcde_tpu.solvers.reversible_adjoint import reversible_heun_solve
from torchcde_tpu.solvers.runge_kutta import STEPPERS

_M = np.array([[-0.3, 1.1], [-1.1, -0.3]])
_Z0 = np.array([1.0, -0.5])


def _rhs(t, z):
    return z @ jnp.asarray(_M.T, z.dtype)


@pytest.mark.parametrize("method,options", [
    ("rk4", dict(step_size=0.1)),
    ("dopri5", dict()),
])
def test_non_increasing_ts_raises(method, options):
    cfg = SolverConfig(method=method, **options)
    z0 = jnp.asarray(_Z0)
    for bad in ([0.0, 1.0, 0.5], [0.0, 1.0, 1.0]):
        with pytest.raises(ValueError, match="monotonically increasing"):
            odeint(_rhs, z0, np.asarray(bad), cfg)


def test_unsorted_jump_t_matches_sorted():
    # A kinked field; the kink locations declared out of order must produce
    # the identical step mesh (and therefore bitwise-identical output).
    def rhs(t, z):
        return jnp.where(t < 1.0, z, -0.5 * z)

    cfg = SolverConfig(method="dopri5", rtol=1e-6, atol=1e-8)
    z0 = jnp.asarray(_Z0)
    ts = np.linspace(0.0, 2.0, 5)
    jumps_sorted = jnp.asarray([0.5, 1.0, 1.5])
    jumps_unsorted = jnp.asarray([1.5, 0.5, 1.0])
    out_s, stats_s = odeint(rhs, z0, ts, cfg, jump_t=jumps_sorted,
                            collect_stats=True)
    out_u, stats_u = odeint(rhs, z0, ts, cfg, jump_t=jumps_unsorted,
                            collect_stats=True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))
    assert int(stats_s["nfe"]) == int(stats_u["nfe"])


@pytest.mark.parametrize("method,options", [
    ("rk4", dict(step_size=0.1)),
    ("rk4", dict()),
    ("dopri5", dict()),
])
def test_single_output_time(method, options):
    cfg = SolverConfig(method=method, **options)
    z0 = jnp.asarray(_Z0)
    out = odeint(_rhs, z0, np.asarray([0.25]), cfg)
    assert out.shape == (1,) + z0.shape
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(z0))


@pytest.mark.parametrize("differentiable", [True, False])
def test_traced_ts_fixed_step_matches_concrete(differentiable):
    # Traced output times lose the static step bound; the scan pads to a
    # large default with cond-guarded iterations.  The result must match the
    # concrete-ts solve (and not hang paying rhs work on padding).
    cfg = SolverConfig(method="rk4", step_size=0.125)
    z0 = jnp.asarray(_Z0)
    ts = np.linspace(0.0, 1.0, 4)

    ref = odeint(_rhs, z0, ts, cfg, differentiable=differentiable)
    traced = jax.jit(
        lambda tts: odeint(_rhs, z0, tts, cfg, differentiable=differentiable)
    )(jnp.asarray(ts))
    np.testing.assert_allclose(np.asarray(traced), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_traced_ts_padding_is_guarded():
    # The padded iterations must not evaluate the rhs: a guard value planted
    # past t1 would poison the state if the body ran on dt == 0 padding.
    def rhs(t, z):
        # NaN anywhere past the integration span: only reachable if a padded
        # (dt == 0) iteration evaluates the rhs at the clamped endpoint and
        # feeds it through a zero-weighted update — the old behaviour paid
        # the evaluation; 0 * nan would still have been nan.
        return jnp.where(t > 1.0 + 1e-6, jnp.nan, 1.0) * z

    cfg = SolverConfig(method="rk4", step_size=0.25)
    z0 = jnp.asarray(_Z0)
    ts = np.asarray([0.0, 1.0])
    out = jax.jit(lambda tts: odeint(rhs, z0, tts, cfg))(jnp.asarray(ts))
    assert np.all(np.isfinite(np.asarray(out)))


def test_reversible_heun_solve_matches_generic_path():
    # The one-evaluation-per-step cache (fhat carried through the loop and
    # across intervals) must be fp-identical to the generic Stepper, whose
    # init re-evaluates rhs at every interval start.
    consts = jnp.asarray(_M.T)

    def rhs_c(t, y, c):
        return y @ c

    z0 = jnp.asarray(_Z0)
    ts = np.linspace(0.0, 2.0, 6)
    h = 0.05
    out_scan = reversible_heun_solve(rhs_c, consts, z0, ts, h)
    cfg = SolverConfig(method="reversible_heun", step_size=h)
    out_generic = odeint(lambda t, z: rhs_c(t, z, consts), z0, ts, cfg)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_generic),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("method", ["dopri8", "adaptive_heun", "fehlberg2",
                                    "bosh3", "dopri5"])
def test_nfe_follows_stepper_declaration(method):
    stepper = STEPPERS[method]
    cfg = SolverConfig(method=method, rtol=1e-5, atol=1e-7)
    z0 = jnp.asarray(_Z0)
    _, stats = odeint(_rhs, z0, np.asarray([0.0, 3.0]), cfg,
                      collect_stats=True)
    expected = (stepper.init_nfe + 2  # +2: initial-step-size heuristic
                + int(stats["steps_attempted"]) * stepper.nfe_per_step)
    assert int(stats["nfe"]) == expected


@pytest.mark.parametrize("method", ["rk4", "explicit_adams", "implicit_adams"])
def test_nfe_fixed_step_declaration(method):
    stepper = STEPPERS[method]
    cfg = SolverConfig(method=method, step_size=0.25)
    z0 = jnp.asarray(_Z0)
    ts = np.linspace(0.0, 2.0, 3)
    _, stats = odeint(_rhs, z0, ts, cfg, collect_stats=True)
    steps = int(stats["steps_attempted"])
    assert steps == 8
    assert int(stats["nfe"]) == stepper.init_nfe + steps * stepper.nfe_per_step


@pytest.mark.parametrize(
    "adjoint,method,kw",
    [(False, "rk4", {"options": {"step_size": 1.0}}),
     (True, "rk4", {"options": {"step_size": 1.0}}),
     (False, "dopri5", {}),
     (False, "reversible_heun", {"backend": "torchsde", "dt": 0.5})],
)
def test_non_monotone_t_raises_on_every_path(adjoint, method, kw):
    """Regression: the fixed-step fast paths plan the solve from t directly
    and used to return a garbage row for out-of-order output times instead
    of the adaptive drivers' eager error (integrate.py guard)."""
    import torchcde_tpu as tc

    X = tc.CubicSpline(tc.natural_cubic_coeffs(jnp.ones((2, 5, 2))))
    with pytest.raises(ValueError, match="monotonically increasing"):
        tc.cdeint(X=X, func=lambda t, z: jnp.zeros(z.shape + (2,)),
                  z0=jnp.ones((2, 3)), t=jnp.asarray([0.0, 2.0, 1.0]),
                  adjoint=adjoint, method=method, **kw)
