"""Reverse-differentiable bounded loops.

``lax.while_loop`` is not reverse-mode differentiable, so direct
(discretise-then-optimise) backprop through the solvers — the reference's
``adjoint=False`` path, delegated to torchdiffeq's autograd
(/root/reference/torchcde/solver.py:226-227) — needs a loop primitive that XLA
can differentiate.  ``bounded_while_loop`` runs a ``lax.scan`` over a static
step budget with the body wrapped in ``lax.cond``: on TPU a scalar-predicate
cond lowers to a real branch, so exhausted iterations cost (almost) nothing,
and scan/cond are both reverse-differentiable.
"""

import jax


def bounded_while_loop(cond_fun, body_fun, init_val, max_steps):
    """Like ``lax.while_loop`` but reverse-differentiable, bounded by ``max_steps``."""
    if max_steps <= 0:
        raise ValueError(f"max_steps must be positive, got {max_steps}")

    def scan_body(carry, _):
        val, done = carry

        def run(val):
            new_val = body_fun(val)
            return new_val, ~cond_fun(new_val)

        def skip(val):
            return val, done

        val, done = jax.lax.cond(done, skip, run, val)
        return (val, done), None

    init_done = ~cond_fun(init_val)
    (final_val, _), _ = jax.lax.scan(scan_body, (init_val, init_done), None, length=max_steps)
    return final_val
