"""Memory-efficient adjoint backpropagation via custom_vjp.

Native replacement for torchdiffeq.odeint_adjoint / torchsde.sdeint_adjoint as
consumed by the reference (/root/reference/torchcde/solver.py:226-230): the
forward solve stores only the outputs at ``ts``; the backward pass integrates
the augmented adjoint ODE

    d/dt [z, a, a_theta] = [f, -a^T df/dz, -a^T df/dtheta]

in reverse over each output interval, restarting z from the saved forward
value at every boundary (torchdiffeq's strategy).  Gradients flow to z0, to
every array closed over by the vector field (func parameters *and*
interpolation coefficients — the reference's explicit ``adjoint_params``,
solver.py:207-222, is subsumed by closure conversion in cdeint), and to the
output times ``ts`` themselves (contract: reference test/test_tricks.py:21-49).

Reverse-time integration reuses the forward steppers through the s = -t
substitution, so adjoint solves get the same adaptive/fixed machinery.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .integrate import SolverConfig, odeint

_tree_map = jax.tree_util.tree_map


def odeint_adjoint(rhs, consts, z0, ts, cfg: SolverConfig, adjoint_cfg: SolverConfig,
                   jump_t=None, grad_mask=None):
    """Solve with O(1)-in-steps memory backprop.

    rhs: pure function rhs(t, z, consts); consts: pytree of arrays that should
    receive gradients.  Output has time-leading axes like ``odeint``.

    ``grad_mask`` (static tuple of bools over ``consts`` entries, or None for
    all-True) restricts which consts the backward pass integrates adjoints
    for — the reference's explicit ``adjoint_params`` narrowing
    (solver.py:207-222); masked-out consts get zero gradients and cost the
    augmented solve nothing.
    """
    if grad_mask is not None:
        grad_mask = tuple(bool(m) for m in grad_mask)
    return _odeint_adjoint(rhs, cfg, adjoint_cfg, grad_mask, consts, z0, ts, jump_t)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _odeint_adjoint(rhs, cfg, adjoint_cfg, grad_mask, consts, z0, ts, jump_t):
    return odeint(lambda t, z: rhs(t, z, consts), z0, ts, cfg, jump_t,
                  differentiable=False)


def _fwd(rhs, cfg, adjoint_cfg, grad_mask, consts, z0, ts, jump_t):
    zs = odeint(lambda t, z: rhs(t, z, consts), z0, ts, cfg, jump_t,
                differentiable=False)
    return zs, (consts, z0, ts, jump_t, zs)


def _bwd(rhs, cfg, adjoint_cfg, grad_mask, residuals, g):
    all_consts, z0, ts, jump_t, zs = residuals
    if grad_mask is None:
        consts = all_consts
        rebuild = lambda grads: grads
    else:
        # Integrate adjoints only for the masked-in consts; the rest ride
        # along as frozen closure data and get zero cotangents.
        consts = [c for c, m in zip(all_consts, grad_mask) if m]
        frozen = [c for c, m in zip(all_consts, grad_mask) if not m]
        inner_rhs = rhs

        def rhs(t, z, grad_consts):
            gi, fi = iter(grad_consts), iter(frozen)
            full = [next(gi) if m else next(fi) for m in grad_mask]
            return inner_rhs(t, z, full)

        def rebuild(grads):
            gi = iter(grads)
            return [
                next(gi) if m else jnp.zeros_like(c)
                for c, m in zip(all_consts, grad_mask)
            ]
    # Host (NumPy) grids must become device arrays here: the backward scan
    # indexes ts with a traced interval index.
    ts = jnp.asarray(ts)

    def index_time(tree, i):
        return _tree_map(lambda x: x[i], tree)

    def aug_rhs(s, aug, consts):
        # s = -t; d/ds z = -f, d/ds a = +a^T df/dz, d/ds a_c = +a^T df/dc.
        z, a, _a_consts = aug
        t = -s
        f, pullback = jax.vjp(lambda z_, c_: rhs(t, z_, c_), z, consts)
        vjp_z, vjp_consts = pullback(a)
        return (_tree_map(jnp.negative, f), vjp_z, vjp_consts)

    neg_jump = None
    if jump_t is not None:
        neg_jump = jnp.sort(-jump_t)

    n_out = ts.shape[0]
    a_consts0 = _tree_map(jnp.zeros_like, consts)

    def backward_interval(carry, i):
        # Integrate the augmented state from ts[i] down to ts[i - 1].
        a, a_consts = carry
        z_i = index_time(zs, i)
        g_i = index_time(g, i)
        a = _tree_map(jnp.add, a, g_i)
        f_i = rhs(ts[i], z_i, consts)
        # dL/dts[i] = g_i . f(ts[i], z_i)   (readout-time sensitivity).
        t_vjp_i = sum(
            jnp.sum(gl * fl)
            for gl, fl in zip(jax.tree_util.tree_leaves(g_i), jax.tree_util.tree_leaves(f_i))
        )
        aug0 = (z_i, a, a_consts)
        span = jnp.stack([-ts[i], -ts[i - 1]])
        aug1 = odeint(
            lambda s, aug: aug_rhs(s, aug, consts), aug0, span, adjoint_cfg, neg_jump,
            differentiable=False,
        )
        _z, a, a_consts = index_time(aug1, 1)
        return (a, a_consts), t_vjp_i

    a_init = _tree_map(jnp.zeros_like, index_time(zs, 0))
    (a_final, a_consts_final), t_vjps_rev = jax.lax.scan(
        backward_interval, (a_init, a_consts0), jnp.arange(n_out - 1, 0, -1)
    )

    # dL/dts[0] = -a(t0) . f(t0, z0), with a(t0) excluding g_0.
    f_0 = rhs(ts[0], index_time(zs, 0), consts)
    t_vjp_0 = -sum(
        jnp.sum(al * fl)
        for al, fl in zip(jax.tree_util.tree_leaves(a_final), jax.tree_util.tree_leaves(f_0))
    )
    ts_bar = jnp.zeros_like(ts)
    ts_bar = ts_bar.at[jnp.arange(n_out - 1, 0, -1)].set(t_vjps_rev)
    ts_bar = ts_bar.at[0].set(t_vjp_0)

    z0_bar = _tree_map(jnp.add, a_final, index_time(g, 0))
    jump_bar = None if jump_t is None else jnp.zeros_like(jump_t)
    return rebuild(a_consts_final), z0_bar, ts_bar, jump_bar


_odeint_adjoint.defvjp(_fwd, _bwd)
