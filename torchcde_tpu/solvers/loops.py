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
import jax.numpy as jnp

# Above this budget the scan is chunked with sqrt-rematerialisation: reverse
# AD then stores O(sqrt(max_steps)) chunk-boundary carries plus one chunk of
# per-step residuals, instead of residuals for every padded iteration — the
# difference between direct backprop through a 4096-step budget being usable
# and OOMing at large batch.
_CHECKPOINT_THRESHOLD = 128


def bounded_while_loop(cond_fun, body_fun, init_val, max_steps):
    """Like ``lax.while_loop`` but reverse-differentiable, bounded by ``max_steps``.

    Large step budgets run as an outer scan over ``jax.checkpoint``-ed chunks
    of ~sqrt(max_steps) iterations (values and gradients are bit-identical to
    the flat scan; the backward pass recomputes one chunk at a time).
    """
    if max_steps <= 0:
        raise ValueError(f"max_steps must be positive, got {max_steps}")

    def scan_body(carry, _):
        val, done = carry

        def run(val):
            new_val = body_fun(val)
            return new_val, jnp.logical_not(cond_fun(new_val))

        def skip(val):
            return val, done

        val, done = jax.lax.cond(done, skip, run, val)
        return (val, done), None

    # jnp.logical_not, not ``~``: with a *concrete* initial value cond_fun can
    # return a Python bool, and Python's ~True is the int -2 — which would
    # poison the loop-carry dtype.
    init = (init_val, jnp.logical_not(cond_fun(init_val)))
    if max_steps <= _CHECKPOINT_THRESHOLD:
        (final_val, _), _ = jax.lax.scan(scan_body, init, None, length=max_steps)
        return final_val

    n_inner = 1 << (((max_steps - 1).bit_length() + 1) // 2)  # ~sqrt, power of 2
    n_outer = -(-max_steps // n_inner)

    @jax.checkpoint
    def chunk(carry):
        carry, _ = jax.lax.scan(scan_body, carry, None, length=n_inner)
        return carry

    def outer_body(carry, _):
        # Chunk-level early exit: once the loop condition is exhausted, the
        # remaining outer iterations take the identity branch — one scalar
        # branch per chunk instead of n_inner cond-guarded body skips, and
        # (because the cond is outside the checkpoint) the backward pass
        # recomputes nothing for skipped chunks.  Runtime is therefore
        # proportional to the *realised* step count (rounded up to one
        # chunk), not to the static max_steps budget, in both directions.
        _, done = carry
        return jax.lax.cond(done, lambda c: c, chunk, carry), None

    (final_val, _), _ = jax.lax.scan(outer_body, init, None, length=n_outer)
    return final_val
