"""Per-kernel attribution for the fused masked-cubic fit (scratch harness).

Times each of the four streaming kernels in isolation (synthetic operands of
the right shapes/layouts) at BASELINE config 3 to direct optimisation:
Hillis-Steele VPU levels scale with log2(kb); HBM traffic with the operand
count.  Not part of the committed bench record.
"""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchcde_tpu.ops import masked_cubic_pallas as mcp

BATCH, LENGTH = 8192, 4096
KB = int(sys.argv[1]) if len(sys.argv) > 1 else 128

rng = np.random.default_rng(0)


def mk(shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def slope(name, fn, args, k1=2, k2=8, reps=5):
    def make(kk):
        @jax.jit
        def run(x0, *rest):
            def body(carry, _):
                y = fn(carry, *rest)
                leaves = jax.tree_util.tree_leaves(y)
                bump = (jnp.sum(leaves[0]) * 1e-20).astype(x0.dtype)
                return x0 + bump, None
            final, _ = jax.lax.scan(body, x0, None, length=kk)
            return jnp.sum(final.ravel()[:1])
        return run
    f1, f2 = make(k1), make(k2)
    float(f1(*args)); float(f2(*args))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t0
        out.append((t2 - t1) / (k2 - k1))
    print(f"{name}: {float(np.median(out))*1e3:8.3f} ms", flush=True)


k, n, kb = LENGTH, BATCH, KB
dt = jnp.float32
tcol = jnp.arange(k, dtype=dt).reshape(-1, 1)
obs = (jnp.asarray(rng.random((k, n))) > 0.2).astype(dt)
xs = mk((k, n))
hr, pds, sph = mk((k, n)), mk((k, n)), mk((k, n))
nd, nb = jnp.abs(mk((k, n))) + 1.0, mk((k, n))
a0, b0, c0, d0 = mk((k, n)), mk((k, n)), mk((k, n)), mk((k, n))


def run(kernel, n_out, n_carry, wb, reverse, args, t_pos=()):
    # t_pos: positions of (k, 1) time-column operands (an identity check on
    # the concrete tcol fails under jit, where operands are tracers).
    grid = (n // wb, k // kb)
    spec = mcp._specs(k, n, kb, wb, reverse=reverse)
    tspec = mcp._specs(k, n, kb, wb, t=True, reverse=reverse)
    in_specs = [tspec if i in t_pos else spec for i, a in enumerate(args)]
    carry = pltpu.VMEM((1, wb), dt)
    shape = jax.ShapeDtypeStruct((k, n), dt)
    return pl.pallas_call(
        kernel,
        out_shape=tuple([shape] * n_out) if n_out > 1 else shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([spec] * n_out) if n_out > 1 else spec,
        scratch_shapes=[carry] * n_carry,
    )(*args)


print(f"kb={kb}")
slope("K1 prep (3 in, 3 out)",
      lambda x, t, o: run(mcp._prep_kernel, 3, 3, 256, True, (x, t, o),
                          t_pos=(1,)),
      (xs, tcol, obs))
slope("K2 assemble (3 in, 2 out)",
      lambda h, p, o: run(mcp._assemble_fwd_kernel, 2, 6, 256, False, (h, p, o)),
      (hr, pds, obs))
slope("K3 subst (6 in, 4 out)",
      lambda *a: run(mcp._subst_kernel, 4, 1, 256, True, a),
      (nd, nb, hr, sph, xs, obs))
slope("K4 rebase (6 in, 4 out)",
      lambda a, b, c, d, t, o: run(mcp._rebase_kernel, 4, 6, 128, False,
                                   (a, b, c, d, t, o), t_pos=(4,)),
      (a0, b0, c0, d0, tcol, obs))

# A pure copy kernel with K3's operand count: the DMA floor for that shape.
def _copy6_kernel(i1, i2, i3, i4, i5, i6, o1, o2, o3, o4):
    o1[:, :] = i1[:, :]
    o2[:, :] = i2[:, :]
    o3[:, :] = i3[:, :]
    o4[:, :] = i4[:, :] + i5[:, :] + i6[:, :]

slope("copy floor (6 in, 4 out)",
      lambda *a: run(_copy6_kernel, 4, 0, 256, False, a),
      (nd, nb, hr, sph, xs, obs))
