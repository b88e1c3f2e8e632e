"""Pallas TPU kernel: batched tridiagonal solve via in-VMEM PCR+Thomas hybrid.

The natural-cubic-spline fit's hot kernel (SURVEY.md section 3.3; reference
misc.py:13-67 runs the same recurrence as a Python loop).  I/O is batch-major
(n, k) — the caller's layout — and each grid step owns one lane block that is
transposed to length-major *in VMEM* (batch rides the VPU lanes for the
solve; the layout change is a VPU shuffle, not an HBM round trip), so HBM
sees exactly one read of the system and one write of the solution.

A plain Thomas sweep is sequential in the length k: 2k loop iterations each
touching a single (1, W) row — at most one VPU sublane of useful work per
iteration, which is why the naive kernel sat at ~2% of HBM bandwidth.  The
hybrid instead runs log2(G) levels of parallel cyclic reduction over the WHOLE
(k, W) block (every level is a handful of full-block vector ops, perfectly
lane- and sublane-parallel), after which rows only couple at stride G: the
system splits into G independent interleaved subsystems of length m = k / G.
Element q of subsystem j is row q*G + j, so the q-th *contiguous* slab of G
rows holds element q of every subsystem, and a Thomas sweep over slabs
finishes the solve in 2m iterations of fat (G, W) vector ops.  Sequential
depth drops from 2k thin rows to log2(G) block passes + 2m slab passes.

Lengths above the single-block VMEM cap are handled by running PCR pre-levels
at the XLA level (identical elimination math, one fused HBM pass per level)
until the interleaved subsystems fit the kernel, then folding the interleave
factor into the batch dimension.

Differentiable via custom_vjp: for x = A^{-1} b,
    grad_b = A^{-T} g            (one more tridiagonal solve, swapped bands)
    grad_diag_i  = -grad_b_i * x_i
    grad_upper_i = -grad_b_i * x_{i+1}
    grad_lower_i = -grad_b_{i+1} * x_i
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# Single-block cap on the length dimension: beyond this the live (k, 128) f32
# arrays (5 VMEM blocks + ~13 PCR temporaries held by Mosaic, measured from
# scoped-vmem sizes) outgrow the 16MB VMEM, and XLA-level PCR pre-splitting
# takes over.
MAX_KERNEL_LENGTH = 1024
# Lane-block budget in elements per array: ~26 live (k, tile) f32 arrays
# (5 blocks + 4 scratch + PCR and block-transpose temporaries) within ~14MB.
_VMEM_ELEM_BUDGET = 14 * 1024 * 1024 // (26 * 4)


def _choose_gsize(k):
    """Interleave factor G: PCR runs log2(G) levels, Thomas runs k/G slabs.

    More PCR levels cost ~18 full-block vector ops each; more slabs cost loop
    overhead on thinner work.  G is never below a full lane tile (128):
    current Mosaic toolchains reject dynamic lane-dimension stores whose
    offset is not provably a multiple of 128, so the Thomas sweep's per-slab
    output stores (``out_ref[:, pl.ds(q * G, G)]``) must be lane-aligned —
    the earlier sub-lane slabs (G down to 1) no longer compile on TPU.
    """
    if k <= 128:
        # One slab after padding: the only store sits at lane offset 0.
        return 1 << int(np.ceil(np.log2(max(k, 2))))
    g = 1 << max(7, int(round(np.log2(max(k // 16, 8)))))
    return int(min(g, 256, 1 << int(np.floor(np.log2(k)))))


def _pcr_thomas_kernel(d_ref, b_ref, u_ref, l_ref, out_ref, sd_ref, sb_ref,
                       su_ref, sl_ref, *, gsize):
    """In-VMEM hybrid solve of one batch-major (W, k) block.

    The block is transposed to length-major (k, W) *in VMEM* — the length
    axis must ride the lanes for the PCR levels, but the layout change costs
    a VPU shuffle, not the XLA transpose round trips the caller used to pay
    (HBM reads/writes each array once, in the caller's layout).

    Convention: lo[i] couples row i to row i - stride (lo[0..stride) = 0) and
    up[i] couples row i to row i + stride (tail zeros), where stride doubles
    each PCR level starting at 1.

    Intermediate state lands in the s*_ref scratch buffers, NEVER in the input
    blocks: writing an input ref makes Pallas alias it as an output, and under
    a fused jit program XLA then updates the donor HBM buffer in place — a
    second solve sharing those operands (e.g. the transpose solve inside the
    custom VJP) would read the eliminated bands instead of the originals.
    """
    w, k = d_ref.shape
    d = d_ref[:, :].T
    b = b_ref[:, :].T
    up = u_ref[:, :].T
    lo = l_ref[:, :].T

    levels = int(np.log2(gsize))
    if levels:
        rows = jax.lax.broadcasted_iota(jnp.int32, (k, w), 0)
        s = 1
        for _ in range(levels):
            # dn(x)[i] = x[i - s], up_(x)[i] = x[i + s]; rolls wrap, but the
            # wrapped rows are exactly the has_up/has_dn-masked ones.
            dn = lambda x: pltpu.roll(x, s, axis=0)
            up_ = lambda x: pltpu.roll(x, k - s, axis=0)
            has_up = rows >= s
            has_dn = rows < k - s
            alpha = jnp.where(has_up, -lo / dn(d), 0.0)
            beta = jnp.where(has_dn, -up / up_(d), 0.0)
            d = d + alpha * dn(up) + beta * up_(lo)
            b = b + alpha * dn(b) + beta * up_(b)
            lo = alpha * dn(lo)
            up = beta * up_(up)
            s *= 2

    # Rows now couple only at stride gsize: slab q = rows [q*G, (q+1)*G) holds
    # element q of every interleaved subsystem.  Park the PCR output in the
    # length-major scratch buffers and Thomas-sweep over slabs, carrying the
    # previous pivot slab in registers; solution slabs land in the batch-major
    # output block via a per-slab VMEM transpose.
    sd_ref[:, :] = d
    sb_ref[:, :] = b
    su_ref[:, :] = up
    sl_ref[:, :] = lo
    m = k // gsize

    def slab(ref, q):
        return ref[pl.ds(q * gsize, gsize), :]

    def fwd(q, carry):
        prev_d, prev_b, prev_u = carry
        wq = slab(sl_ref, q) / prev_d
        nd = slab(sd_ref, q) - wq * prev_u
        nb = slab(sb_ref, q) - wq * prev_b
        sd_ref[pl.ds(q * gsize, gsize), :] = nd
        sb_ref[pl.ds(q * gsize, gsize), :] = nb
        return nd, nb, slab(su_ref, q)

    init = (slab(sd_ref, 0), slab(sb_ref, 0), slab(su_ref, 0))
    jax.lax.fori_loop(1, m, fwd, init)

    x_last = slab(sb_ref, m - 1) / slab(sd_ref, m - 1)
    out_ref[:, pl.ds((m - 1) * gsize, gsize)] = x_last.T

    def bwd(j, x_next):
        q = m - 2 - j
        x = (slab(sb_ref, q) - slab(su_ref, q) * x_next) / slab(sd_ref, q)
        out_ref[:, pl.ds(q * gsize, gsize)] = x.T
        return x

    jax.lax.fori_loop(0, m - 1, bwd, x_last)


def _lane_tile(k, n):
    """Widest batch tile that divides n and fits the VMEM element budget."""
    tile = _LANES
    budget = max(_VMEM_ELEM_BUDGET // max(k, 1), _LANES)
    while tile * 2 <= budget and n % (tile * 2) == 0 and tile < 2048:
        tile *= 2
    return tile


@partial(jax.jit, static_argnames=("interpret",))
def _pallas_block_solve(d, b, u, l, interpret=False):
    """Solve for batch-major (n, k) arrays; n % 128 == 0, k a multiple of
    the chosen interleave factor.  Layout transposes happen on the VMEM
    blocks inside the kernel."""
    n, k = d.shape
    gsize = _choose_gsize(k)
    tile = _lane_tile(k, n)
    spec = pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_pcr_thomas_kernel, gsize=gsize),
        out_shape=jax.ShapeDtypeStruct((n, k), d.dtype),
        grid=(n // tile,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((k, tile), d.dtype),
            pltpu.VMEM((k, tile), d.dtype),
            pltpu.VMEM((k, tile), d.dtype),
            pltpu.VMEM((k, tile), d.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(18 * int(np.log2(max(gsize, 1))) + 8) * k * n,
            bytes_accessed=5 * 4 * k * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d, b, u, l)


def _xla_pcr_level(d, b, up, lo, s):
    """One PCR elimination level on (..., k)-last arrays (stride s).

    Same math as the kernel's in-VMEM levels; used to pre-split systems whose
    length exceeds the single-block cap.  lo[i] couples row i to i - s, up[i]
    couples row i to i + s.
    """
    k = d.shape[-1]

    def down(x):  # value from row i - s, zero past the boundary
        return jnp.concatenate([jnp.zeros_like(x[..., :s]), x[..., :-s]], axis=-1)

    def upx(x):  # value from row i + s, zero past the boundary
        return jnp.concatenate([x[..., s:], jnp.zeros_like(x[..., :s])], axis=-1)

    idx = jax.lax.broadcasted_iota(jnp.int32, (k,), 0)
    alpha = jnp.where(idx >= s, -lo / down(d), 0.0)
    beta = jnp.where(idx < k - s, -up / upx(d), 0.0)
    d2 = d + alpha * down(up) + beta * upx(lo)
    b2 = b + alpha * down(b) + beta * upx(b)
    return d2, b2, beta * upx(up), alpha * down(lo)


def _solve_padded(d, b, up, lo, interpret=False):
    """d, b, up, lo: (N, k) with per-row coupling convention (lo[:, 0] = 0,
    up[:, -1] = 0) and N a multiple of 128.  Returns x (N, k)."""
    n, k = d.shape

    n_pre = 0
    while (k >> n_pre) > MAX_KERNEL_LENGTH:
        n_pre += 1
    if n_pre:
        # Pre-split at the XLA level: after n_pre PCR levels rows couple at
        # stride 2^n_pre, so the residue classes are independent systems that
        # fold into the batch dimension.
        split = 1 << n_pre
        pad = (-k) % split
        if pad:
            d = jnp.concatenate([d, jnp.ones((n, pad), d.dtype)], axis=-1)
            zpad = jnp.zeros((n, pad), d.dtype)
            b = jnp.concatenate([b, zpad], axis=-1)
            up = jnp.concatenate([up, zpad], axis=-1)
            lo = jnp.concatenate([lo, zpad], axis=-1)
        s = 1
        for _ in range(n_pre):
            d, b, up, lo = _xla_pcr_level(d, b, up, lo, s)
            s *= 2
        kp = d.shape[-1]
        m = kp // split

        def fold(x):  # (N, k) -> (N * split, m): subsystem j is row q*split+j
            return x.reshape(n, m, split).swapaxes(-1, -2).reshape(n * split, m)

        x = _solve_padded(fold(d), fold(b), fold(up), fold(lo), interpret)
        x = x.reshape(n, split, m).swapaxes(-1, -2).reshape(n, kp)
        return x[:, :k] if pad else x

    gsize = _choose_gsize(k)
    pad = (-k) % max(gsize, 1)
    if pad:
        # Identity padding rows (d=1, couplings and rhs 0) decouple exactly:
        # PCR never propagates real couplings into them (the last real row's
        # upper coupling is zero and stays zero inductively).
        d = jnp.concatenate([d, jnp.ones((n, pad), d.dtype)], axis=-1)
        zpad = jnp.zeros((n, pad), d.dtype)
        b = jnp.concatenate([b, zpad], axis=-1)
        up = jnp.concatenate([up, zpad], axis=-1)
        lo = jnp.concatenate([lo, zpad], axis=-1)
    x = _pallas_block_solve(d, b, up, lo, interpret=interpret)
    return x[:, :k] if pad else x


def _solve_flat(b, u, d, l, interpret=False):
    """b, d: (N, k); u, l: (N, k - 1).  Returns x (N, k)."""
    n, k = b.shape
    zeros = jnp.zeros((n, 1), dtype=b.dtype)
    up = jnp.concatenate([u, zeros], axis=-1)  # up[i] couples row i to i+1
    lo = jnp.concatenate([zeros, l], axis=-1)  # lo[i] couples row i to i-1

    pad = (-n) % _LANES
    if pad:
        d = jnp.concatenate([d, jnp.ones((pad, k), d.dtype)], axis=0)
        zrows = jnp.zeros((pad, k), b.dtype)
        b = jnp.concatenate([b, zrows], axis=0)
        up = jnp.concatenate([up, zrows], axis=0)
        lo = jnp.concatenate([lo, zrows], axis=0)
    x = _solve_padded(d, b, up, lo, interpret)
    return x[:n] if pad else x


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _tridiagonal_pallas(b, u, d, l, interpret=False):
    return _solve_flat(b, u, d, l, interpret)


def _tp_fwd(b, u, d, l, interpret):
    x = _solve_flat(b, u, d, l, interpret)
    return x, (x, u, d, l)


def _tp_bwd(interpret, res, g):
    x, u, d, l = res
    # A^T has the bands swapped.
    y = _solve_flat(g, l, d, u, interpret)
    grad_b = y
    grad_d = -y * x
    grad_u = -y[..., :-1] * x[..., 1:]
    grad_l = -y[..., 1:] * x[..., :-1]
    return grad_b, grad_u, grad_d, grad_l


_tridiagonal_pallas.defvjp(_tp_fwd, _tp_bwd)


def tridiagonal_solve_pallas(b, A_upper, A_diagonal, A_lower, *, interpret=False):
    """Drop-in for ops.tridiagonal.tridiagonal_solve on TPU.

    Same signature/broadcast semantics as the reference misc.py:13-67:
    b (..., k), A_upper/A_lower (..., k - 1), A_diagonal (..., k).  Any length
    is accepted; systems longer than the in-VMEM cap are PCR-pre-split.
    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend), used by the CPU equivalence tests.
    """
    from .pallas_dispatch import upcast_kernel_operands

    (b, A_upper, A_diagonal, A_lower), restore = upcast_kernel_operands(
        b, A_upper, A_diagonal, A_lower
    )
    shape = jnp.broadcast_shapes(A_diagonal.shape, b.shape)
    k = shape[-1]
    off_shape = shape[:-1] + (k - 1,)
    b_ = jnp.broadcast_to(b, shape).reshape(-1, k)
    d_ = jnp.broadcast_to(A_diagonal, shape).reshape(-1, k)
    u_ = jnp.broadcast_to(A_upper, off_shape).reshape(-1, k - 1)
    l_ = jnp.broadcast_to(A_lower, off_shape).reshape(-1, k - 1)
    x = _tridiagonal_pallas(b_, u_, d_, l_, interpret)
    return restore(x.reshape(shape))


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False
