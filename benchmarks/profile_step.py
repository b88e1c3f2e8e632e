"""Bisect the flagship train step: full step vs loss-grad only vs solve only."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import optax

import torchcde_tpu as tc
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde, neural_cde_apply, bce_with_logits
from torchcde_tpu.models.training import make_train_step

BATCH, LENGTH, HIDDEN, WIDTH = 4096, 100, 8, 128
rng = np.random.default_rng(0)
x = rng.standard_normal((BATCH, LENGTH, 3)).astype(np.float32)
y = (rng.random(BATCH) > 0.5).astype(np.float32)
cfg = NeuralCDEConfig(input_channels=3, hidden_channels=HIDDEN, output_channels=1,
                      width=WIDTH, interpolation="cubic", solver="rk4",
                      adjoint=False, step_size=1.0)
coeffs = jax.jit(tc.hermite_cubic_coefficients_with_backward_differences)(jnp.asarray(x))
yd = jnp.asarray(y)
params = init_neural_cde(jax.random.PRNGKey(0), cfg)
optimizer = optax.adam(1e-3)
opt_state = optimizer.init(params)
step_fn = make_train_step(cfg, optimizer)

def say(*a): print(*a, flush=True)

def slope(name, body_fn, carry0, k1=3, k2=15, reps=4):
    def runner(k):
        @jax.jit
        def run(carry, coeffs, y):
            def body(c, _):
                return body_fn(c, coeffs, y)
            out, loss = jax.lax.scan(body, carry, None, length=k)
            return loss
        return run
    f1, f2 = runner(k1), runner(k2)
    import time as _t
    t0=_t.perf_counter(); float(np.asarray(f1(carry0, coeffs, yd)).ravel()[-1]); say(f"  [{name}] k1 compile {_t.perf_counter()-t0:.0f}s")
    t0=_t.perf_counter(); float(np.asarray(f2(carry0, coeffs, yd)).ravel()[-1]); say(f"  [{name}] k2 compile {_t.perf_counter()-t0:.0f}s")
    out = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(np.asarray(f1(carry0, coeffs, yd)).ravel()[-1]); t1 = time.perf_counter()-t0
        t0 = time.perf_counter(); float(np.asarray(f2(carry0, coeffs, yd)).ravel()[-1]); t2 = time.perf_counter()-t0
        out.append((t2-t1)/(k2-k1))
    v = float(np.median(out))
    say(f"{name}: {v*1e3:.3f} ms/iter")
    return v

# 1. full train step (params+opt update chained)
def full_body(c, coeffs, y):
    p, o = c
    p, o, loss = step_fn(p, o, coeffs, y)
    return (p, o), loss
slope("train step (full)", full_body, (params, opt_state))

# 2. loss+grad only (chain params through grads, no optimizer)
def lg_body(p, coeffs, y):
    def loss_fn(pp):
        logits = neural_cde_apply(pp, cfg, coeffs)[..., 0]
        return bce_with_logits(logits, y)
    loss, g = jax.value_and_grad(loss_fn)(p)
    p2 = jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, p, g)
    return p2, loss
slope("loss+grad only", lg_body, params)

# 3. forward only
def fwd_body(p, coeffs, y):
    logits = neural_cde_apply(p, cfg, coeffs)[..., 0]
    loss = bce_with_logits(logits, y)
    p2 = jax.tree_util.tree_map(lambda a: a + 0.0 * loss, p)
    return p2, loss
slope("forward only", fwd_body, params)
say("device:", jax.devices()[0].device_kind)
