"""Stage attribution for BASELINE config 3 (NaN-masked natural cubic fit).

Not part of the committed bench record — a scratch slope-timing harness that
splits natural_cubic_coeffs' time between (a) the imputation prologue,
(b) the batch-major -> length-major transposes bracketing the fused fit,
and (c) the four streaming Pallas kernels themselves (_fit_2d), to direct
optimisation at whichever bracket dominates.
"""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import torchcde_tpu as tc
from torchcde_tpu.ops import masked_cubic_pallas as mcp

BATCH, LENGTH = 8192, 4096
rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, LENGTH, 1)).astype(np.float32)
x[rng.random(x.shape) < 0.2] = np.nan
xj = jnp.asarray(x)


def say(*a):
    print(*a, flush=True)


def slope(name, op, args, k1=2, k2=8, reps=5):
    def make(k):
        @jax.jit
        def run(x0, *extras):
            def body(carry, _):
                y = op(carry, *extras)
                leaves = jax.tree_util.tree_leaves(y)
                bump = (jnp.sum(leaves[0]) * 1e-20).astype(x0.dtype)
                return x0 + bump, None
            final, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(final[:1, :1])
        return run
    f1, f2 = make(k1), make(k2)
    float(f1(*args)); float(f2(*args))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t0
        out.append((t2 - t1) / (k2 - k1))
    say(f"{name}: {float(np.median(out))*1e3:.3f} ms")


# (1) whole public pipeline
slope("natural_cubic_coeffs (full)", lambda a: tc.natural_cubic_coeffs(a), (xj,))

# (1b) the batch-major fused path it now dispatches to (raw values in,
# in-kernel imputation + transposes, batch-major out)
t_full = jnp.arange(LENGTH, dtype=jnp.float32)
slope("masked_natural_cubic_full (batch-major)",
      lambda a: mcp.masked_natural_cubic_full(t_full, a[..., 0], 1), (xj,))

# (2) the legacy length-major fit incl. its transposes, on the
# already-imputed array
t = jnp.arange(LENGTH, dtype=jnp.float32)
slope("masked_natural_cubic_pallas (fit + transposes)",
      lambda a: mcp.masked_natural_cubic_pallas(t, a[..., 0]), (xj,))

# (3) the four kernels alone, on pre-transposed length-major operands
k = LENGTH
x2 = xj[..., 0].reshape(-1, k).T
obs2 = (~jnp.isnan(x2)).astype(x2.dtype)
xs2 = jnp.where(obs2 > 0.5, x2, jnp.zeros_like(x2))
tcol = t.reshape(-1, 1)
slope("_fit_2d (4 kernels, length-major)",
      lambda xs, tc_, ob: mcp._fit_2d(xs, tc_, ob), (xs2, tcol, obs2))

# (4) the bracketing transposes alone (in + 4 out)
def transposes(a):
    y = a[..., 0].reshape(-1, k).T
    outs = [(y + i).T for i in range(4)]
    return sum(jnp.sum(o[:1, :1]) for o in outs)
slope("transposes alone (1 in + 4 out)", transposes, (xj,))

say("device:", jax.devices()[0].device_kind)
