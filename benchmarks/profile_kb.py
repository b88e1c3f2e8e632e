"""Block-size sweep for the fused masked-cubic streaming kernels.

The four kernels each run log2(kb) Hillis-Steele levels per (kb, wb) block,
and every level costs a full-block roll+select regardless of kb — so total
VPU work scales with log2(kb) while DMA bytes are constant.  Smaller blocks
mean fewer levels (kb=64 does 6 where kb=512 does 9) at the cost of more
grid steps and carry hand-offs.  This harness slope-times the public
batch-major entry at BASELINE config 3 for each candidate kb to pick the
default empirically.

Scratch harness — not part of the committed bench record.
"""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from torchcde_tpu.ops import masked_cubic_pallas as mcp

BATCH, LENGTH = 8192, 4096
rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, LENGTH)).astype(np.float32)
x[rng.random(x.shape) < 0.2] = np.nan
xj = jnp.asarray(x)
t_full = jnp.arange(LENGTH, dtype=jnp.float32)


def slope(op, k1=2, k2=8, reps=5):
    def make(kk):
        @jax.jit
        def run(x0):
            def body(carry, _):
                y = op(carry)
                leaves = jax.tree_util.tree_leaves(y)
                bump = (jnp.sum(leaves[0]) * 1e-20).astype(x0.dtype)
                return x0 + bump, None
            final, _ = jax.lax.scan(body, x0, None, length=kk)
            return jnp.sum(final[:1, :1])
        return run
    f1, f2 = make(k1), make(k2)
    float(f1(xj)); float(f2(xj))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(xj)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(xj)); t2 = time.perf_counter() - t0
        out.append((t2 - t1) / (k2 - k1))
    return float(np.median(out)) * 1e3


if __name__ == "__main__":
    kbs = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    # Reference values once for correctness cross-check.
    ref = mcp.masked_natural_cubic_full(t_full, xj, 1, kb=512)
    for kb in kbs:
        got = mcp.masked_natural_cubic_full(t_full, xj, 1, kb=kb)
        err = max(float(jnp.nanmax(jnp.abs(g - r))) for g, r in zip(got, ref))
        ms = slope(lambda a, _kb=kb: mcp.masked_natural_cubic_full(
            t_full, a, 1, kb=_kb))
        print(f"kb={kb:4d}: {ms:8.3f} ms   max|diff vs kb=512| = {err:.3e}",
              flush=True)
