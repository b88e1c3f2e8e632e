"""Slope-timed pack vs solve profile of the flagship fused rk4 kernel on TPU.

Not part of the committed bench record — a scratch profiling harness for
attributing the flagship train step's time between operand packing (the
kernel-layout transpose in fused_pallas._pack_operands) and the fused solve
itself.  Uses the same two-length scan-slope timing as bench.py to cancel
the axon tunnel's per-dispatch cost.
"""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import torchcde_tpu as tc
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
from torchcde_tpu.solvers import fused_pallas as fp
from torchcde_tpu.solvers.terms import MLPVectorField

BATCH, LENGTH, HIDDEN, WIDTH = 4096, 100, 8, 128
rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, LENGTH, 3)).astype(np.float32)


def say(*a):
    print(*a, flush=True)


@jax.jit
def make_inputs(x):
    coeffs = tc.hermite_cubic_coefficients_with_backward_differences(x)
    return coeffs


coeffs = make_inputs(jnp.asarray(x))
X = tc.CubicSpline(coeffs)
params = init_neural_cde(jax.random.PRNGKey(0), NeuralCDEConfig(
    input_channels=3, hidden_channels=HIDDEN, output_channels=1, width=WIDTH,
    interpolation="cubic", solver="rk4", step_size=1.0))
w1 = params["func1"]["w"]    # (H, W)
b1 = params["func1"]["b"]
w2 = params["func2"]["w"]    # (W, H*C)
b2 = params["func2"]["b"]
z0 = jnp.zeros((BATCH, HIDDEN), jnp.float32)
n = LENGTH - 1
mf = MLPVectorField(w1, b1, w2, b2, HIDDEN, 3)


@jax.jit
def packed_arrays(b, c, d, z, w1, b1, w2, b2):
    mf2 = MLPVectorField(w1, b1, w2, b2, HIDDEN, 3)
    p = fp._pack_operands(b, c, d, z, mf2, n)
    return p.ct2, p.z0t, p.w1t, p.b1c, p.w2t, p.b2c


ct2, z0t, w1t, b1c, w2t, b2c = jax.block_until_ready(
    packed_arrays(X._b, X._two_c, X._three_d, z0, w1, b1, w2, b2))
# Recompute the static plan (tiles/padding) from shapes, host-side:
class Plan:
    pass


plan = Plan()
plan.C, plan.H, plan.W = 3, HIDDEN, WIDTH
plan.Hp = fp._round_up(HIDDEN, 8)
plan.CHp = fp._round_up(3 * HIDDEN, 8)
Bp = fp._round_up(BATCH, fp._LANES)
plan.tile = min(fp.MAX_TILE_BWD, Bp)
Bp = fp._round_up(Bp, plan.tile)
plan.n_tiles = Bp // plan.tile
plan.tile_fwd = fp.MAX_TILE_FWD if Bp % fp.MAX_TILE_FWD == 0 else plan.tile
plan.n_tiles_fwd = Bp // plan.tile_fwd
plan.Bp = Bp
say("plan:", ct2.shape, plan.tile, plan.n_tiles, plan.tile_fwd, plan.n_tiles_fwd)


def slope(name, f, args, k1=3, k2=15, reps=4):
    f1 = jax.jit(lambda *a: f(*a, k1))
    f2 = jax.jit(lambda *a: f(*a, k2))
    t0 = time.perf_counter()
    float(f1(*args))
    say(f"  [{name}] k1 compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    float(f2(*args))
    say(f"  [{name}] k2 compile+run {time.perf_counter()-t0:.1f}s")
    out = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t0
        out.append((t2 - t1) / (k2 - k1))
    v = float(np.median(out))
    say(f"{name}: {v*1e3:.3f} ms/iter")
    return v


# --- 1. pack only (forward), chained through b_rows ---
def pack_k(b, c, d, z, k):
    def body(carry, _):
        bb = carry
        out = packed_arrays.__wrapped__(bb, c, d, z, w1, b1, w2, b2)
        return bb + 0.0 * out[0][0, 0], out[0][0, 0]
    _, outs = jax.lax.scan(body, b, None, length=k)
    return jnp.sum(outs)


slope("pack fwd", pack_k, (X._b, X._two_c, X._three_d, z0))

# --- 2. solve only, pre-packed operands, chained through z0t ---
solve = fp._make_fused_solve(n, plan.tile_fwd, plan.n_tiles_fwd, plan.tile,
                             plan.n_tiles, 1, 1.0, fp._TABLEAUS["rk4"],
                             plan.C, plan.H, plan.W, plan.CHp, False)


def solve_k(ct2, z0t, k):
    def body(carry, _):
        zz = carry
        zout = solve(ct2, zz, w1t, b1c, w2t, b2c)
        return z0t + 0.0 * zout[:plan.Hp, :], zout[0, 0]
    _, outs = jax.lax.scan(body, z0t, None, length=k)
    return jnp.sum(outs)


slope("solve fwd", solve_k, (ct2, z0t))


# --- 3. solve fwd+bwd (grads wrt weights), pre-packed ---
def solvegrad_k(ct2, z0t, w1t_, k):
    def one(w):
        zout = solve(ct2, z0t, w, b1c, w2t, b2c)
        return jnp.sum(jnp.tanh(zout))
    def body(carry, _):
        w = carry
        g = jax.grad(one)(w)
        return w + 0.0 * g, g[0, 0]
    _, outs = jax.lax.scan(body, w1t_, None, length=k)
    return jnp.sum(outs)


slope("solve f+b", solvegrad_k, (ct2, z0t, w1t))


# --- 4. full cdeint fwd+bwd through packing (grads wrt weights only) ---
def full_k(w1_, k):
    def one(w):
        mf2 = MLPVectorField(w, b1, w2, b2, HIDDEN, 3)
        out = tc.cdeint(X, mf2, z0, X.interval, adjoint=False, method="rk4",
                        options=dict(step_size=1.0))
        return jnp.sum(jnp.tanh(out))
    def body(carry, _):
        w = carry
        g = jax.grad(one)(w)
        return w + 0.0 * g, g[0, 0]
    _, outs = jax.lax.scan(body, w1_, None, length=k)
    return jnp.sum(outs)


slope("full cdeint f+b", full_k, (w1,))

# --- 5. full cdeint f+b with grads to coeffs as well (the packing bwd) ---
def fullc_k(w1_, bco, k):
    def one(w, bc):
        X2 = tc.CubicSpline(bc)
        mf2 = MLPVectorField(w, b1, w2, b2, HIDDEN, 3)
        out = tc.cdeint(X2, mf2, z0, X2.interval, adjoint=False, method="rk4",
                        options=dict(step_size=1.0))
        return jnp.sum(jnp.tanh(out))
    def body(carry, _):
        w = carry
        g, gc = jax.grad(one, argnums=(0, 1))(w, bco)
        return w + 0.0 * g, g[0, 0] + gc.reshape(-1)[0]
    _, outs = jax.lax.scan(body, w1_, None, length=k)
    return jnp.sum(outs)


slope("full+coeffgrad f+b", fullc_k, (w1, coeffs))
say("device:", jax.devices()[0].device_kind)
