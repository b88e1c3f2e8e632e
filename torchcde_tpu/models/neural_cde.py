"""Neural CDE model family.

Functional (pytree-parameter) re-design of the reference's example model
(/root/reference/example/time_series_classification.py:20-94):

    CDEFunc:  Linear -> ReLU -> Linear -> tanh, reshaped to
              (..., hidden_channels, input_channels)
    NeuralCDE: z0 = initial(X(t0));  z_T = cdeint(X, f, z0, interval);
              pred = readout(z_T)

Parameters are plain pytrees (dicts of arrays) so the whole train step jits,
vmaps, and shards with no module machinery; a flax wrapper is unnecessary for
the solver path because ``cdeint`` calls the vector field inside lax loops.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..interpolation import CubicSpline, LinearInterpolation
from ..solvers import cdeint


def _dense_init(key, n_in, n_out, dtype):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(n_in)
    w = jax.random.uniform(wkey, (n_in, n_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (n_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _dense(params, x):
    return x @ params["w"] + params["b"]


@dataclasses.dataclass(frozen=True)
class NeuralCDEConfig:
    input_channels: int
    hidden_channels: int
    output_channels: int
    width: int = 128
    interpolation: str = "cubic"  # "cubic" | "linear"
    solver: str = "dopri5"
    adjoint: bool = True
    rtol: float = 1e-4
    atol: float = 1e-6
    step_size: float = None
    # Mixed precision: cast parameters + coefficients to this dtype (e.g.
    # "bfloat16") for the forward/solve while master params, optimizer state
    # and the loss stay f32.  On TPU the fused solve kernels then keep the
    # coefficient slabs — the dominant HBM stream — in bf16 end to end
    # (solvers/fused_pallas.py dtype policy) with f32 carried state.
    compute_dtype: str = None


def init_neural_cde(key, cfg: NeuralCDEConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "initial": _dense_init(k1, cfg.input_channels, cfg.hidden_channels, dtype),
        "func1": _dense_init(k2, cfg.hidden_channels, cfg.width, dtype),
        "func2": _dense_init(
            k3, cfg.width, cfg.hidden_channels * cfg.input_channels, dtype
        ),
        "readout": _dense_init(k4, cfg.hidden_channels, cfg.output_channels, dtype),
    }


def cde_func(params, cfg: NeuralCDEConfig):
    """The vector field f(t, z) -> (..., hidden, input); the final tanh keeps
    the model's rate-of-change bounded (reference
    time_series_classification.py:43-50 explains why this matters).

    Returns an ``MLPVectorField`` — behaviourally a plain callable, but the
    fixed-step fast path recognizes it and fuses the whole solve into one
    Pallas TPU kernel (solvers/fused_pallas.py)."""
    from ..solvers.terms import MLPVectorField

    return MLPVectorField(
        params["func1"]["w"], params["func1"]["b"],
        params["func2"]["w"], params["func2"]["b"],
        cfg.hidden_channels, cfg.input_channels,
    )


def make_control(coeffs, cfg: NeuralCDEConfig, t=None):
    if cfg.interpolation == "cubic":
        return CubicSpline(coeffs, t)
    elif cfg.interpolation == "linear":
        return LinearInterpolation(coeffs, t)
    raise ValueError(f"Unknown interpolation {cfg.interpolation!r}")


def neural_cde_apply(params, cfg: NeuralCDEConfig, coeffs, t=None):
    """Forward pass: coeffs (..., L', k*channels) -> predictions (..., output).

    Mirrors NeuralCDE.forward (time_series_classification.py:66-94): initial
    state from the first observation, terminal solve value through a linear
    readout.
    """
    if cfg.compute_dtype is not None:
        cd = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(lambda a: a.astype(cd), params)
        coeffs = jax.tree_util.tree_map(lambda a: a.astype(cd), coeffs)
    X = make_control(coeffs, cfg, t)
    interval = X.interval
    X0 = X.evaluate(interval[0])
    z0 = _dense(params["initial"], X0)

    kwargs = {}
    if cfg.step_size is not None:
        kwargs["options"] = {"step_size": cfg.step_size}
    z_t = cdeint(
        X=X,
        func=cde_func(params, cfg),
        z0=z0,
        t=interval,
        adjoint=cfg.adjoint,
        method=cfg.solver,
        rtol=cfg.rtol,
        atol=cfg.atol,
        **kwargs,
    )
    z_T = z_t[..., -1, :]
    return _dense(params["readout"], z_T)


def bce_with_logits(logits, labels):
    """Binary cross entropy on logits (the example's training loss,
    time_series_classification.py:154)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
