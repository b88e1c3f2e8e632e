"""O(1)-memory exact adjoint for the reversible Heun method.

The capability torchsde's reversible Heun adds over torchdiffeq (reference
README.md:105; Kidger et al. 2021, "Efficient and Accurate Gradients for
Neural SDEs"): the update map

    f̂_n    = f(t_n, ŷ_n)
    ŷ_{n+1} = 2 y_n - ŷ_n + h f̂_n
    y_{n+1} = y_n + (h/2)(f̂_n + f(t_{n+1}, ŷ_{n+1}))

is *algebraically invertible* — applying the same map with h -> -h from
(y_{n+1}, ŷ_{n+1}) returns (y_n, ŷ_n) exactly (in exact arithmetic; to the
same roundoff in floating point).  The backward pass therefore reconstructs
the trajectory step-by-step with the inverse map and accumulates the VJP of
each forward step: gradients are *bit-exact discretise-then-optimise*
gradients at O(1) memory in the number of steps — unlike the continuous
backsolve adjoint, which carries O(h^p) gradient discrepancy.

Storage: only (y, ŷ) at the requested output times.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_tree_map = jax.tree_util.tree_map


def _fwd_step(rhs, consts, t, dt, y, yhat):
    fhat = rhs(t, yhat, consts)
    yhat1 = _tree_map(lambda a, b, c: 2 * a - b + dt * c, y, yhat, fhat)
    fhat1 = rhs(t + dt, yhat1, consts)
    y1 = _tree_map(lambda a, b, c: a + 0.5 * dt * (b + c), y, fhat, fhat1)
    return y1, yhat1


def _inv_step(rhs, consts, t1, dt, y1, yhat1):
    """Exact inverse: recover (y_n, yhat_n) from the state at t1 = t_n + dt."""
    f1 = rhs(t1, yhat1, consts)
    yhat = _tree_map(lambda a, b, c: 2 * a - b - dt * c, y1, yhat1, f1)
    f0 = rhs(t1 - dt, yhat, consts)
    y = _tree_map(lambda a, b, c: a - 0.5 * dt * (b + c), y1, f1, f0)
    return y, yhat


def _n_steps(t0, t1, h):
    return int(np.ceil((t1 - t0) / h - 1e-9))


def reversible_heun_solve(rhs, consts, z0, ts, step_size):
    """Solve with the reversible Heun method; output time-leading like odeint.

    ``ts`` and ``step_size`` must be concrete (the exact step sequence must be
    replayable in reverse).  Gradients flow to consts, z0, and ts.
    """
    if not isinstance(ts, np.ndarray):
        ts_host = np.asarray(jax.lax.stop_gradient(ts), dtype=np.float64)
    else:
        ts_host = np.asarray(ts, dtype=np.float64)
    h = float(step_size)
    n_per_interval = tuple(
        _n_steps(ts_host[i], ts_host[i + 1], h) for i in range(len(ts_host) - 1)
    )
    return _rev_heun(rhs, h, n_per_interval, consts, z0, jnp.asarray(ts))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _rev_heun(rhs, h, n_per_interval, consts, z0, ts):
    ys, _yhats = _forward(rhs, h, n_per_interval, consts, z0, ts)
    return ys


def _interval_fwd(rhs, h, n, consts, t0, t1, y, yhat, fhat):
    # fhat = rhs(t, yhat) is carried through the loop AND across intervals:
    # each step's fhat1 is evaluated at t + dt = the next step's t (interval
    # ends clamp to t1 = the next interval's t0), so the forward pays one
    # rhs evaluation per step instead of two — the method's advertised cost.
    def body(j, carry):
        y, yhat, fhat = carry
        t = jnp.minimum(t0 + j * h, t1)
        t_next = jnp.minimum(t0 + (j + 1) * h, t1)
        dt = t_next - t
        yhat1 = _tree_map(lambda a, b, c: 2 * a - b + dt * c, y, yhat, fhat)
        # Evaluated at the exact fp expression the next iteration (and the
        # next interval's first iteration) uses for its t, so the cache is
        # bit-identical to an uncached re-evaluation.
        fhat1 = rhs(t_next, yhat1, consts)
        y1 = _tree_map(lambda a, b, c: a + 0.5 * dt * (b + c), y, fhat, fhat1)
        return y1, yhat1, fhat1

    return jax.lax.fori_loop(0, n, body, (y, yhat, fhat))


def _forward(rhs, h, n_per_interval, consts, z0, ts):
    fhat0 = rhs(ts[0], z0, consts)
    if len(set(n_per_interval)) == 1:
        # Uniform output spacing (the overwhelmingly common case): one scan
        # over intervals instead of len(ts) unrolled program copies.
        n = n_per_interval[0]

        def interval(carry, t_pair):
            y, yhat, fhat = _interval_fwd(
                rhs, h, n, consts, t_pair[0], t_pair[1], *carry)
            return (y, yhat, fhat), (y, yhat)

        _, (ys_s, yhats_s) = jax.lax.scan(
            interval, (z0, z0, fhat0), (ts[:-1], ts[1:]))
        cat = lambda z, s: _tree_map(lambda a, b: jnp.concatenate([a[None], b], 0), z, s)
        return cat(z0, ys_s), cat(z0, yhats_s)

    y, yhat, fhat = z0, z0, fhat0
    ys = [z0]
    yhats = [z0]
    for i, n in enumerate(n_per_interval):
        y, yhat, fhat = _interval_fwd(rhs, h, n, consts, ts[i], ts[i + 1],
                                      y, yhat, fhat)
        ys.append(y)
        yhats.append(yhat)
    stack = lambda xs: _tree_map(lambda *ls: jnp.stack(ls, axis=0), *xs)
    return stack(ys), stack(yhats)


def _rev_fwd(rhs, h, n_per_interval, consts, z0, ts):
    ys, yhats = _forward(rhs, h, n_per_interval, consts, z0, ts)
    return ys, (consts, ts, ys, yhats)


def _interval_bwd(rhs, h, n, consts, t0, t1, y, yhat, a_y, a_yhat, a_consts, ts_dtype):
    """Reverse one interval: reconstruct states with the inverse map and pull
    the cotangents back through each forward step.  Returns the updated
    adjoints plus the (ts[i-1], ts[i]) time cotangents of this interval."""

    def body(jj, carry):
        j = n - 1 - jj
        y, yhat, a_y, a_yhat, a_consts, a_t0, a_t1 = carry
        t = jnp.minimum(t0 + j * h, t1)
        t_next = jnp.minimum(t0 + (j + 1) * h, t1)
        dt = t_next - t
        y_prev, yhat_prev = _inv_step(rhs, consts, t_next, dt, y, yhat)

        def step_fn(t_, dt_, y_, yhat_, c_):
            return _fwd_step(rhs, c_, t_, dt_, y_, yhat_)

        _, pullback = jax.vjp(step_fn, t, dt, y_prev, yhat_prev, consts)
        t_bar, dt_bar, a_y, a_yhat, ac_inc = pullback((a_y, a_yhat))
        a_consts = _tree_map(jnp.add, a_consts, ac_inc)
        # t = t0 + j*h unless clamped to t1; dt = t_next - t with t_next
        # clamped to t1 on the final partial step.
        t_clamped = (t0 + j * h) > t1
        next_clamped = (t0 + (j + 1) * h) > t1
        dtb_t0 = jnp.where(next_clamped, -dt_bar, 0.0) + jnp.where(
            t_clamped, dt_bar, 0.0
        )
        dtb_t1 = jnp.where(next_clamped, dt_bar, 0.0) - jnp.where(
            t_clamped, dt_bar, 0.0
        )
        a_t0 = a_t0 + jnp.where(t_clamped, 0.0, t_bar) + dtb_t0
        a_t1 = a_t1 + jnp.where(t_clamped, t_bar, 0.0) + dtb_t1
        return (y_prev, yhat_prev, a_y, a_yhat, a_consts, a_t0, a_t1)

    zero = jnp.zeros((), ts_dtype)
    out = jax.lax.fori_loop(0, n, body, (y, yhat, a_y, a_yhat, a_consts, zero, zero))
    _y, _yhat, a_y, a_yhat, a_consts, a_t0, a_t1 = out
    return a_y, a_yhat, a_consts, a_t0, a_t1


def _rev_bwd(rhs, h, n_per_interval, residuals, g):
    consts, ts, ys, yhats = residuals

    def at_time(tree, i):
        return _tree_map(lambda x: x[i], tree)

    a_consts = _tree_map(jnp.zeros_like, consts)
    a_y = _tree_map(jnp.zeros_like, at_time(ys, 0))
    a_yhat = _tree_map(jnp.zeros_like, a_y)
    ts_bar = jnp.zeros_like(ts)
    n_out = len(n_per_interval) + 1

    if len(set(n_per_interval)) == 1:
        n = n_per_interval[0]
        # Iterate intervals i = n_out-1 .. 1 as one scan; each restarts from
        # the saved output state, so no cross-interval (y, yhat) carry.
        rev = lambda tree: _tree_map(lambda x: x[:0:-1], tree)
        xs = (ts[:-1][::-1], ts[:0:-1], rev(g), rev(ys), rev(yhats))

        def interval(carry, xs_i):
            a_y, a_yhat, a_consts = carry
            t0, t1, g_i, y_i, yhat_i = xs_i
            a_y = _tree_map(jnp.add, a_y, g_i)
            a_y, a_yhat, a_consts, a_t0, a_t1 = _interval_bwd(
                rhs, h, n, consts, t0, t1, y_i, yhat_i, a_y, a_yhat, a_consts,
                ts.dtype,
            )
            return (a_y, a_yhat, a_consts), (a_t0, a_t1)

        (a_y, a_yhat, a_consts), (a_t0s, a_t1s) = jax.lax.scan(
            interval, (a_y, a_yhat, a_consts), xs
        )
        ts_bar = ts_bar.at[:-1].add(a_t0s[::-1]).at[1:].add(a_t1s[::-1])
    else:
        for i in range(n_out - 1, 0, -1):
            a_y = _tree_map(jnp.add, a_y, at_time(g, i))
            a_y, a_yhat, a_consts, a_t0, a_t1 = _interval_bwd(
                rhs, h, n_per_interval[i - 1], consts, ts[i - 1], ts[i],
                at_time(ys, i), at_time(yhats, i), a_y, a_yhat, a_consts,
                ts.dtype,
            )
            ts_bar = ts_bar.at[i - 1].add(a_t0).at[i].add(a_t1)

    a_y = _tree_map(jnp.add, a_y, at_time(g, 0))
    z0_bar = _tree_map(jnp.add, a_y, a_yhat)  # yhat_0 = y_0 = z0
    return a_consts, z0_bar, ts_bar


_rev_heun.defvjp(_rev_fwd, _rev_bwd)
