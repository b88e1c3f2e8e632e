"""Pallas TPU kernels: masked ('gappy') tridiagonal solve, streaming blocks.

The NaN-masked natural-cubic fit solves a tridiagonal system that couples
consecutive OBSERVED knots, with missing rows passing the Thomas carry
through (interpolation/cubic.py:_masked_thomas_observed mirrors reference
interpolation_cubic.py:78-167 behaviour).  The XLA ``lax.scan`` version runs
2k sequential steps of lane-thin work (~14 GB/s at 8192x4096); these kernels
instead stream (KB, WB) blocks through VMEM with the recurrences evaluated as
ASSOCIATIVE prefix scans, so every sequential step is a full-block VPU pass:

* forward elimination  nd_i = d_i - hp_i^2 / nd_{i-1}  is a linear-fractional
  (Mobius) recurrence: with nd_i = p_i / q_i it is the 2x2 matrix product
  (p, q)_i = [[d_i, -hp_i^2], [1, 0]] (p, q)_{i-1}, and a missing row is the
  identity matrix — a Hillis–Steele prefix scan over rows with per-position
  renormalisation (the ratio is scale-invariant, so overflow is controlled
  by dividing each (p, q) by max(|p|, |q|)).
* the rhs sweep  nb_i = r_i - (hp_i / nd_{i-1}) nb_{i-1}  and the back
  substitution  x_i = (nb_i - h_i x_{i+1}) / nd_i  are affine recurrences
  y <- A + B y, composed by (A2 + B2*A1, B2*B1) — the same prefix pattern.

The length axis is cut into KB-row blocks iterated as the innermost
(sequential) TPU grid dimension, with the running (p, q) / nb / x carries
held in VMEM scratch that persists across grid steps — an O(k) recurrence
becomes log2(KB) vector passes per block plus one scalar-row carry hop per
block.  One forward kernel writes (nd, nb); one reverse-ordered kernel
writes x.  HBM sees each array exactly once per kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KB = 128  # rows per block (length axis); batch-major I/O pins it to 128s
_WB = 256  # lanes per block (batch axis)
# In-kernel scan granularity (see masked_cubic_pallas._SUB_ASSEMBLE): each
# Hillis-Steele level costs a full-array roll+select, so the prefix scans run
# over (sub, wb) slices with local (1, wb) carry folds — log2(sub) levels of
# slice-sized work instead of log2(kb) block-sized levels, with no extra DMA
# or grid steps.  8 is the f32 sublane tile.
_SUB = 8


def _identity_mask(shape, s):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return rows >= s


def _matmul2(a00, a01, a10, a11, b00, b01, b10, b11):
    return (
        a00 * b00 + a01 * b10,
        a00 * b01 + a01 * b11,
        a10 * b00 + a11 * b10,
        a10 * b01 + a11 * b11,
    )


def _rescale2(m00, m01, m10, m11):
    s = 1.0 / jnp.maximum(
        jnp.maximum(jnp.abs(m00), jnp.abs(m01)),
        jnp.maximum(jnp.maximum(jnp.abs(m10), jnp.abs(m11)), 1e-30),
    )
    return m00 * s, m01 * s, m10 * s, m11 * s


def _fwd_kernel(d_ref, r_ref, hp_ref, obs_ref, nd_ref, nb_ref, cp_ref, cq_ref,
                cb_ref, sub=None):
    # Boundary inputs arrive batch-major (the caller's layout) and are
    # transposed on the VMEM block; the (nd, nb) intermediates handed to the
    # backward kernel stay length-major.
    wb, kb = d_ref.shape
    sub = min(sub or _SUB, kb)
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        cp_ref[:, :] = jnp.ones((1, wb), d_ref.dtype)
        cq_ref[:, :] = jnp.ones((1, wb), d_ref.dtype)
        cb_ref[:, :] = jnp.zeros((1, wb), d_ref.dtype)

    d_all = d_ref[:, :].T
    r_all = r_ref[:, :].T
    hp_all = hp_ref[:, :].T
    obs_all = obs_ref[:, :].T > 0.5

    cp, cq, cb = cp_ref[:, :], cq_ref[:, :], cb_ref[:, :]
    for j in range(kb // sub):
        sl = pl.ds(j * sub, sub)
        d = d_all[j * sub : (j + 1) * sub, :]
        r = r_all[j * sub : (j + 1) * sub, :]
        hp = hp_all[j * sub : (j + 1) * sub, :]
        obs = obs_all[j * sub : (j + 1) * sub, :]

        # --- nd via 2x2 prefix products ----------------------------------
        c = hp * hp
        m00 = jnp.where(obs, d, 1.0)
        m01 = jnp.where(obs, -c, 0.0)
        m10 = jnp.where(obs, jnp.ones_like(d), 0.0)
        m11 = jnp.where(obs, jnp.zeros_like(d), 1.0)

        s = 1
        while s < sub:
            keep = _identity_mask((sub, wb), s)
            b00 = jnp.where(keep, pltpu.roll(m00, s, axis=0), 1.0)
            b01 = jnp.where(keep, pltpu.roll(m01, s, axis=0), 0.0)
            b10 = jnp.where(keep, pltpu.roll(m10, s, axis=0), 0.0)
            b11 = jnp.where(keep, pltpu.roll(m11, s, axis=0), 1.0)
            m00, m01, m10, m11 = _matmul2(m00, m01, m10, m11,
                                          b00, b01, b10, b11)
            m00, m01, m10, m11 = _rescale2(m00, m01, m10, m11)
            s *= 2

        p = m00 * cp + m01 * cq
        q = m10 * cp + m11 * cq
        scale = 1.0 / jnp.maximum(jnp.maximum(jnp.abs(p), jnp.abs(q)), 1e-30)
        p = p * scale
        q = q * scale
        q_safe = jnp.where(q == 0, 1e-30, q)
        nd = p / q_safe

        # nd_{i-1} per row: shifted (p, q), first row from the carry.
        first = ~_identity_mask((sub, wb), 1)
        p_prev = jnp.where(first, cp, pltpu.roll(p, 1, axis=0))
        q_prev = jnp.where(first, cq, pltpu.roll(q, 1, axis=0))
        nd_prev = p_prev / jnp.where(q_prev == 0, 1e-30, q_prev)

        # --- nb via affine prefix ----------------------------------------
        A = jnp.where(obs, r, 0.0)
        B = jnp.where(obs, -hp / jnp.where(nd_prev == 0, 1e-30, nd_prev),
                      jnp.ones_like(d))
        s = 1
        while s < sub:
            keep = _identity_mask((sub, wb), s)
            A_sh = jnp.where(keep, pltpu.roll(A, s, axis=0), 0.0)
            B_sh = jnp.where(keep, pltpu.roll(B, s, axis=0), 1.0)
            A, B = A + B * A_sh, B * B_sh
            s *= 2
        nb = A + B * cb

        nd_ref[sl, :] = jnp.where(obs, nd, 1.0)
        nb_ref[sl, :] = jnp.where(obs, nb, 0.0)

        cp = p[sub - 1 :, :]
        cq = q[sub - 1 :, :]
        cb = nb[sub - 1 :, :]

    cp_ref[:, :] = cp
    cq_ref[:, :] = cq
    cb_ref[:, :] = cb


def _bwd_kernel(nd_ref, nb_ref, h_ref, obs_ref, x_ref, cx_ref):
    # nd/nb are the forward kernel's length-major intermediates; h/obs come
    # batch-major from the caller, and x leaves batch-major.
    kb, wb = nd_ref.shape
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        cx_ref[:, :] = jnp.zeros((1, wb), nd_ref.dtype)

    nd = nd_ref[:, :]
    nb = nb_ref[:, :]
    h = h_ref[:, :].T
    obs = obs_ref[:, :].T > 0.5

    # x_i = A_i + B_i * x_{i+1}; missing rows pass the carry through.
    nd_safe = jnp.where(nd == 0, 1e-30, nd)
    A = jnp.where(obs, nb / nd_safe, 0.0)
    B = jnp.where(obs, -h / nd_safe, jnp.ones_like(nd))

    rows = jax.lax.broadcasted_iota(jnp.int32, (kb, wb), 0)
    s = 1
    while s < kb:
        keep = rows < kb - s
        A_sh = jnp.where(keep, pltpu.roll(A, kb - s, axis=0), 0.0)
        B_sh = jnp.where(keep, pltpu.roll(B, kb - s, axis=0), 1.0)
        A, B = A + B * A_sh, B * B_sh
        s *= 2
    x = A + B * cx_ref[:, :]

    x_ref[:, :] = jnp.where(obs, x, 0.0).T
    cx_ref[:, :] = x[:1, :]


@partial(jax.jit, static_argnames=("interpret", "sub"))
def _masked_solve_2d(d, r, hp, h, obs, interpret=False, sub=None):
    """Solve on batch-major (n, k) arrays; k % _KB == 0, n % _WB == 0.
    The (nd, nb) intermediate between the two kernels stays length-major."""
    n, k = d.shape
    if sub is None and interpret:
        # One in-kernel slice under interpret: op count stays sane on CPU.
        sub = _KB
    grid = (n // _WB, k // _KB)
    spec = pl.BlockSpec((_KB, _WB), lambda w, kk: (kk, w), memory_space=pltpu.VMEM)
    bmspec = pl.BlockSpec((_WB, _KB), lambda w, kk: (w, kk),
                          memory_space=pltpu.VMEM)
    carry = pltpu.VMEM((1, _WB), d.dtype)

    nd, nb = pl.pallas_call(
        partial(_fwd_kernel, sub=sub),
        out_shape=(
            jax.ShapeDtypeStruct((k, n), d.dtype),
            jax.ShapeDtypeStruct((k, n), d.dtype),
        ),
        grid=grid,
        in_specs=[bmspec, bmspec, bmspec, bmspec],
        out_specs=(spec, spec),
        scratch_shapes=[carry, carry, carry],
        interpret=interpret,
    )(d, r, hp, obs)

    nk = k // _KB
    rspec = pl.BlockSpec(
        (_KB, _WB), lambda w, kk, _nk=nk: (_nk - 1 - kk, w),
        memory_space=pltpu.VMEM,
    )
    bmrspec = pl.BlockSpec(
        (_WB, _KB), lambda w, kk, _nk=nk: (w, _nk - 1 - kk),
        memory_space=pltpu.VMEM,
    )
    x = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, k), d.dtype),
        grid=grid,
        in_specs=[rspec, rspec, bmrspec, bmrspec],
        out_specs=bmrspec,
        scratch_shapes=[carry],
        interpret=interpret,
    )(nd, nb, h, obs)
    return x


def masked_thomas_pallas(diag, rhs, hr, hr_prev, observed, interpret=False,
                         sub=None):
    """Drop-in for interpolation.cubic._masked_thomas_observed on TPU.

    All arrays (..., length); ``observed`` boolean.  Solves the reduced
    natural-spline system living at observed positions (missing rows pass
    through), returning x with zeros at missing positions.
    """
    from .pallas_dispatch import upcast_kernel_operands

    (diag, rhs, hr, hr_prev), restore = upcast_kernel_operands(
        diag, rhs, hr, hr_prev
    )
    shape = diag.shape
    k = shape[-1]
    d2 = diag.reshape(-1, k)
    r2 = rhs.reshape(-1, k)
    hp2 = hr_prev.reshape(-1, k)
    h2 = hr.reshape(-1, k)
    o2 = observed.reshape(-1, k).astype(diag.dtype)

    kpad = (-k) % _KB
    n = d2.shape[0]
    npad = (-n) % _WB
    if kpad or npad:
        # Padding rows/lanes are unobserved pass-throughs (identity in every
        # prefix scan), so they never perturb real rows.
        pk = lambda x, v: jnp.pad(x, ((0, npad), (0, kpad)), constant_values=v)
        d2, r2, hp2, h2 = pk(d2, 1.0), pk(r2, 0.0), pk(hp2, 0.0), pk(h2, 0.0)
        o2 = jnp.pad(o2, ((0, npad), (0, kpad)), constant_values=0.0)

    x = _masked_solve_2d(d2, r2, hp2, h2, o2, interpret=interpret, sub=sub)
    if kpad or npad:
        x = x[:n, :k]
    return restore(x.reshape(shape))
