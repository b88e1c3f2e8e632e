"""Pallas TPU kernel: streaming masked fill (last/next-observed carry).

``ops.fill.masked_fill_scan`` lowers to ``lax.associative_scan`` — log2(n)
full-array HBM passes (~11 ms per fill at 8192x4096, and the NaN cubic fit
runs three of them).  This kernel performs the same select-combine prefix
entirely in VMEM: batch-major (WB, KB) blocks stream through the sequential
TPU grid, are transposed to length-major *in VMEM* (channel counts are tiny,
so the long axis must ride the vector lanes — but the layout change costs a
VPU shuffle, not an HBM round trip), each doing log2(KB) roll-combine vector
passes, with the running (value, seen-an-observation) state carried across
blocks in scratch.  HBM sees each array exactly once, already in the
caller's batch-major layout on both sides.

Semantics match ``masked_fill_scan``: position i receives the most recent
observed entry at or before it (after it, when ``reverse``); positions before
the first observation receive the array's first entry (scan identity), which
is what the XLA combine produces.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KB = 512


def _lane_block(n_vals):
    """Lane width so that ~(3*n_vals + 6) live (KB, WB) f32 arrays (in/out
    blocks, their in-VMEM transposes, carries, and roll temporaries) stay
    within ~9MB of VMEM."""
    return 256 if n_vals <= 2 else 128


def _fill_kernel(*refs, n_vals, reverse):
    in_refs = refs[: n_vals + 1]
    out_refs = refs[n_vals + 1 : 2 * n_vals + 1]
    carry_refs = refs[2 * n_vals + 1 :]
    obs_ref = in_refs[-1]
    wb, kb = obs_ref.shape  # batch-major block; compute runs length-major
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        edge = kb - 1 if reverse else 0
        for cv, ref in zip(carry_refs[:-1], in_refs[:-1]):
            cv[:, :] = ref[:, pl.ds(edge, 1)].T
        carry_refs[-1][:, :] = jnp.zeros((1, wb), obs_ref.dtype)

    vals = [r[:, :].T for r in in_refs[:-1]]
    flag = obs_ref[:, :].T
    rows = jax.lax.broadcasted_iota(jnp.int32, (kb, wb), 0)

    s = 1
    while s < kb:
        if reverse:
            keep = rows < kb - s
            sh = lambda x, _s=s: pltpu.roll(x, kb - _s, axis=0)
        else:
            keep = rows >= s
            sh = lambda x, _s=s: pltpu.roll(x, _s, axis=0)
        take_self = flag > 0.5
        vals = [jnp.where(take_self | ~keep, v, sh(v)) for v in vals]
        flag = jnp.where(keep, jnp.maximum(flag, sh(flag)), flag)
        s *= 2

    # Fold in the cross-block carry: rows still unobserved take the carried
    # value (the scan identity flows regardless of the carry's own flag).
    seen = flag > 0.5
    vals = [jnp.where(seen, v, cv[:, :]) for v, cv in zip(vals, carry_refs[:-1])]
    flag = jnp.maximum(flag, carry_refs[-1][:, :])

    for out, v in zip(out_refs, vals):
        out[:, :] = v.T
    edge = 0 if reverse else kb - 1
    for cv, v in zip(carry_refs[:-1], vals):
        cv[:, :] = v[edge : edge + 1, :]
    carry_refs[-1][:, :] = flag[edge : edge + 1, :]


@partial(jax.jit, static_argnames=("n_vals", "reverse", "interpret"))
def _fill_2d(arrays, obs, n_vals, reverse, interpret=False):
    n, k = obs.shape
    wb = _lane_block(n_vals)
    grid = (n // wb, k // _KB)
    if reverse:
        nk = k // _KB
        spec = pl.BlockSpec((wb, _KB), lambda w, kk, _nk=nk: (w, _nk - 1 - kk),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((wb, _KB), lambda w, kk: (w, kk),
                            memory_space=pltpu.VMEM)
    carry = pltpu.VMEM((1, wb), obs.dtype)
    outs = pl.pallas_call(
        partial(_fill_kernel, n_vals=n_vals, reverse=reverse),
        out_shape=tuple(jax.ShapeDtypeStruct((n, k), a.dtype) for a in arrays),
        grid=grid,
        in_specs=[spec] * (n_vals + 1),
        out_specs=tuple([spec] * n_vals),
        scratch_shapes=[carry] * (n_vals + 1),
        interpret=interpret,
    )(*arrays, obs)
    return outs


def masked_fill_pallas(values, observed, reverse=False, interpret=False):
    """Streaming-kernel version of ops.fill.masked_fill_scan (axis=-1)."""
    from .pallas_dispatch import upcast_kernel_operands

    single = not isinstance(values, (tuple, list))
    if single:
        values = (values,)
    values, restore = upcast_kernel_operands(*values)
    shape = observed.shape
    k = shape[-1]
    obs2 = observed.reshape(-1, k).astype(values[0].dtype)
    arrs = [v.reshape(-1, k) for v in values]

    kpad = (-k) % _KB
    n = obs2.shape[0]
    npad = (-n) % _lane_block(len(arrs))
    if kpad or npad:
        # Length padding sits AFTER the data for forward fills (the carry
        # seeds from row 0, which must be the real first entry) and BEFORE it
        # for reverse fills (carry seeds from the last row).
        kw = (0, kpad) if not reverse else (kpad, 0)
        obs2 = jnp.pad(obs2, ((0, npad), kw))
        arrs = [jnp.pad(a, ((0, npad), kw)) for a in arrs]

    outs = _fill_2d(tuple(arrs), obs2, len(arrs), reverse, interpret)
    if kpad or npad:
        sl = slice(0, k) if not reverse else slice(kpad, kpad + k)
        outs = tuple(o[:n, sl] for o in outs)
    outs = tuple(restore(o.reshape(shape)) for o in outs)
    return outs[0] if single else outs
