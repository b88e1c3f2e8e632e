"""torchcde_tpu: TPU-native (JAX/XLA/Pallas) controlled differential equation solvers.

A brand-new framework with the capabilities of torchcde (reference:
/root/reference/torchcde/__init__.py:1-9): interpolation schemes turning
discrete, irregular, NaN-masked time series into continuous differentiable
control paths, and a native `cdeint` integrator for
dz(t) = f(t, z(t)) dX(t), with memory-efficient adjoint backprop and the
log-ODE (logsignature window) method for long series.
"""

from .interpolation import (
    CubicSpline,
    InterpolationBase,
    LinearInterpolation,
    NaturalCubicSpline,
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
    natural_cubic_spline_coeffs,
)
from .log_ode import logsig_windows, logsignature_windows
from .solvers import SolverConfig, cdeint
from .utils import TupleControl

__version__ = "0.3.0"

# The reference's public surface (torchcde/__init__.py:1-9) plus the
# framework's own additions (SolverConfig).
__all__ = [
    "CubicSpline",
    "InterpolationBase",
    "LinearInterpolation",
    "NaturalCubicSpline",
    "SolverConfig",
    "TupleControl",
    "cdeint",
    "hermite_cubic_coefficients_with_backward_differences",
    "linear_interpolation_coeffs",
    "logsig_windows",
    "logsignature_windows",
    "natural_cubic_coeffs",
    "natural_cubic_spline_coeffs",
    "__version__",
]
