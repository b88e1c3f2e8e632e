"""Adaptive dense output: NFE independent of len(t), 4th-order interpolation.

The reference gets many-output-time solves from torchdiffeq's dense-output
interpolant (consumed at /root/reference/torchcde/solver.py:226-227); the
native equivalent is one continuous dopri5 solve whose accepted steps are
evaluated through a quartic interpolant at every requested time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchcde_tpu.solvers.integrate import SolverConfig, odeint

rng = np.random.default_rng(2024)

# A mildly stiff-free linear system z' = M z with known solution expm(M t) z0.
_M = np.array([[-0.4, 1.3, 0.0], [-1.3, -0.4, 0.5], [0.2, -0.1, -0.9]])
_Z0 = np.array([1.0, -0.5, 0.25])


def _rhs(t, z):
    return z @ jnp.asarray(_M.T)


def _true(ts):
    import scipy.linalg

    return np.stack([scipy.linalg.expm(_M * float(t)) @ _Z0 for t in np.asarray(ts)])


@pytest.mark.parametrize("method", ["dopri5", "bosh3"])
def test_nfe_independent_of_output_grid(method):
    cfg = SolverConfig(method=method, rtol=1e-6, atol=1e-8)
    z0 = jnp.asarray(_Z0)
    _, stats2 = odeint(_rhs, z0, jnp.asarray([0.0, 4.0]), cfg, collect_stats=True)
    ts100 = jnp.linspace(0.0, 4.0, 100)
    out100, stats100 = odeint(_rhs, z0, ts100, cfg, collect_stats=True)
    # The accepted-step sequence never sees the output grid, so NFE is
    # *identical*, not merely within 10%.
    assert int(stats100["nfe"]) == int(stats2["nfe"])
    np.testing.assert_allclose(np.asarray(out100), _true(ts100), rtol=1e-4, atol=1e-6)


def test_dense_values_match_restarted_solve():
    # The interpolated trajectory agrees with solving to each time separately
    # at a much tighter tolerance.
    cfg = SolverConfig(method="dopri5", rtol=1e-7, atol=1e-9)
    z0 = jnp.asarray(_Z0)
    ts = jnp.asarray([0.0, 0.013, 0.4, 1.1, 1.10001, 2.718, 4.0])
    out = odeint(_rhs, z0, ts, cfg)
    np.testing.assert_allclose(np.asarray(out), _true(ts), rtol=1e-5, atol=1e-8)


def test_endpoint_matches_len2_solve():
    # The final output row is the integrator's own state (theta = 1 writes the
    # accepted z1 exactly), so dense output costs nothing at the endpoint.
    cfg = SolverConfig(method="dopri5", rtol=1e-6, atol=1e-8)
    z0 = jnp.asarray(_Z0)
    end2 = odeint(_rhs, z0, jnp.asarray([0.0, 4.0]), cfg)
    end100 = odeint(_rhs, z0, jnp.linspace(0.0, 4.0, 100), cfg)
    np.testing.assert_allclose(np.asarray(end2)[-1], np.asarray(end100)[-1], rtol=1e-12)


def test_grads_flow_through_dense_output():
    cfg = SolverConfig(method="dopri5", rtol=1e-6, atol=1e-8)
    ts = jnp.linspace(0.0, 2.0, 7)

    def loss(z0):
        out = odeint(_rhs, z0, ts, cfg, differentiable=True)
        return jnp.sum(out[1:] ** 2)

    g = jax.grad(loss)(jnp.asarray(_Z0))
    eps = 1e-6
    for i in range(3):
        e = np.zeros(3)
        e[i] = eps
        fd = (loss(jnp.asarray(_Z0 + e)) - loss(jnp.asarray(_Z0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4, atol=1e-7)


def test_dense_output_with_jumps():
    # A kinked vector field handled via jump_t: dense output must still land
    # steps on the discontinuity and interpolate correctly either side.
    def rhs(t, z):
        return jnp.where(t < 1.0, z, -2.0 * z)

    cfg = SolverConfig(method="dopri5", rtol=1e-8, atol=1e-10)
    z0 = jnp.asarray([1.0])
    ts = jnp.asarray([0.0, 0.5, 0.99, 1.0, 1.5, 2.0])
    out = odeint(rhs, z0, ts, cfg, jump_t=jnp.asarray([1.0]))
    tv = np.asarray(ts)
    true = np.where(tv < 1.0, np.exp(tv), np.e * np.exp(-2.0 * (tv - 1.0)))
    np.testing.assert_allclose(np.asarray(out)[:, 0], true, rtol=1e-6)


def test_fixed_step_count_not_padded():
    # Fixed-path stats count real steps, not the padded scan length.
    cfg = SolverConfig(method="rk4", step_size=0.25)
    z0 = jnp.asarray(_Z0)
    _, stats = odeint(_rhs, z0, jnp.asarray([0.0, 1.0, 2.0]), cfg, collect_stats=True)
    assert int(stats["steps_attempted"]) == 8
    assert int(stats["nfe"]) == 8 * 4


def test_dopri8_midstep_output_at_full_order():
    """Methods of order > 4 clamp steps to land ON output times (the shared
    interpolant is only quartic): reading dopri8 between what WOULD be its
    steps must deliver full method accuracy, not a silently-4th-order value.
    Before the clamp, dopri8's large steps left mid-step rows with ~1e-5
    interpolation error at these tolerances."""
    cfg = SolverConfig(method="dopri8", rtol=1e-7, atol=1e-9)
    z0 = jnp.asarray(_Z0)
    ts = jnp.linspace(0.0, 4.0, 23)
    out = odeint(_rhs, z0, ts, cfg)
    np.testing.assert_allclose(np.asarray(out), _true(ts), rtol=1e-7, atol=1e-8)


def test_dopri8_clamped_outputs_cost_at_most_len_ts_extra_steps():
    cfg = SolverConfig(method="dopri8", rtol=1e-7, atol=1e-9)
    z0 = jnp.asarray(_Z0)
    _, stats2 = odeint(_rhs, z0, jnp.asarray([0.0, 4.0]), cfg,
                       collect_stats=True)
    ts = jnp.linspace(0.0, 4.0, 23)
    _, stats23 = odeint(_rhs, z0, ts, cfg, collect_stats=True)
    assert int(stats23["steps_accepted"]) <= int(stats2["steps_accepted"]) + 23
