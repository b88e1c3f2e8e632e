"""Flax (linen) interop: NeuralCDE as an ``nn.Module``.

The core models are functional pytrees (models/neural_cde.py) because the
solver calls the vector field inside lax loops; this wrapper gives flax users
the same architecture as an ``nn.Module``.  The trick: the vector-field
submodule's parameters are materialised with one probe call, then the solver
uses the *pure* ``func.apply`` closure — so nothing stateful ever runs inside
the step loop.  During ``init`` the solve is skipped (parameter shapes do not
depend on it).
"""

import flax.linen as nn
import jax.numpy as jnp

from ..interpolation import CubicSpline, LinearInterpolation
from ..solvers import cdeint


class CDEFunc(nn.Module):
    """f(t, z) -> (..., hidden, input): Linear -> ReLU -> Linear -> tanh
    (the reference example architecture, time_series_classification.py:20-51)."""

    input_channels: int
    hidden_channels: int
    width: int = 128

    @nn.compact
    def __call__(self, t, z):
        h = nn.Dense(self.width)(z)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_channels * self.input_channels)(h)
        h = jnp.tanh(h)
        return h.reshape(h.shape[:-1] + (self.hidden_channels, self.input_channels))


class NeuralCDE(nn.Module):
    """Neural CDE classifier/regressor over interpolation coefficients."""

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

    @nn.compact
    def __call__(self, coeffs):
        if self.interpolation == "cubic":
            X = CubicSpline(coeffs)
        elif self.interpolation == "linear":
            X = LinearInterpolation(coeffs)
        else:
            raise ValueError(f"Unknown interpolation {self.interpolation!r}")

        interval = X.interval
        X0 = X.evaluate(interval[0])
        z0 = nn.Dense(self.hidden_channels, name="initial")(X0)

        func = CDEFunc(self.input_channels, self.hidden_channels, self.width,
                       name="func")
        probe = func(interval[0], z0)  # materialises the submodule parameters
        del probe

        if self.is_initializing():
            z_T = z0  # parameter shapes don't depend on the solve
        else:
            func_vars = {"params": self.variables["params"]["func"]}
            pure_func = lambda t, z: func.apply(func_vars, t, z)
            kwargs = {}
            if self.step_size is not None:
                kwargs["options"] = {"step_size": self.step_size}
            z_t = cdeint(
                X=X, func=pure_func, z0=z0, t=interval, adjoint=self.adjoint,
                method=self.solver, rtol=self.rtol, atol=self.atol, **kwargs,
            )
            z_T = z_t[..., -1, :]

        return nn.Dense(self.output_channels, name="readout")(z_T)
