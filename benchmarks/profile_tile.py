import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import torchcde_tpu as tc
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde
from torchcde_tpu.solvers import fused_pallas as fp
from torchcde_tpu.solvers.terms import MLPVectorField

BATCH, LENGTH, HIDDEN, WIDTH = 4096, 100, 8, 128
rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, LENGTH, 3)).astype(np.float32)
coeffs = jax.jit(tc.hermite_cubic_coefficients_with_backward_differences)(jnp.asarray(x))
X = tc.CubicSpline(coeffs)
params = init_neural_cde(jax.random.PRNGKey(0), NeuralCDEConfig(
    input_channels=3, hidden_channels=HIDDEN, output_channels=1, width=WIDTH,
    interpolation="cubic", solver="rk4", step_size=1.0))
w1 = params["func1"]["w"]; b1 = params["func1"]["b"]
w2 = params["func2"]["w"]; b2 = params["func2"]["b"]
z0 = jnp.zeros((BATCH, HIDDEN), jnp.float32)
n = LENGTH - 1

@jax.jit
def packed_arrays(b, c, d, z, w1, b1, w2, b2):
    mf2 = MLPVectorField(w1, b1, w2, b2, HIDDEN, 3)
    p = fp._pack_operands(b, c, d, z, mf2, n)
    return p.ct2, p.z0t, p.w1t, p.b1c, p.w2t, p.b2c

ct2, z0t, w1t, b1c, w2t, b2c = jax.block_until_ready(
    packed_arrays(X._b, X._two_c, X._three_d, z0, w1, b1, w2, b2))
Hp = fp._round_up(HIDDEN, 8); CHp = fp._round_up(3*HIDDEN, 8)

def say(*a): print(*a, flush=True)

def slope(name, f, args, k1=3, k2=15, reps=4):
    f1 = jax.jit(lambda *a: f(*a, k1)); f2 = jax.jit(lambda *a: f(*a, k2))
    try:
        float(f1(*args)); float(f2(*args))
    except Exception as e:
        say(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    out = []
    for _ in range(reps):
        t0=time.perf_counter(); float(f1(*args)); t1=time.perf_counter()-t0
        t0=time.perf_counter(); float(f2(*args)); t2=time.perf_counter()-t0
        out.append((t2-t1)/(k2-k1))
    say(f"{name}: {float(np.median(out))*1e3:.3f} ms/iter")

for tile_bwd, n_tiles in ((2048, 2), (4096, 1), (1024, 4)):
    solve = fp._make_fused_solve(n, 4096, 1, tile_bwd, n_tiles, 1, 1.0,
                                 fp._TABLEAUS["rk4"], 3, HIDDEN, WIDTH, CHp,
                                 False, jnp.float32)
    def sg_k(ct2, z0t, w1t_, k, solve=solve):
        def one(w):
            return jnp.sum(jnp.tanh(solve(ct2, z0t, w, b1c, w2t, b2c)))
        def body(carry, _):
            g = jax.grad(one)(carry)
            return carry + 0.0*g, g[0,0]
        _, outs = jax.lax.scan(body, w1t_, None, length=k)
        return jnp.sum(outs)
    slope(f"solve f+b [f32, tile_bwd={tile_bwd}]", sg_k, (ct2, z0t, w1t))
say("device:", jax.devices()[0].device_kind)
