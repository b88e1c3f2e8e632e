from .cdeint import cdeint
from .integrate import SolverConfig, odeint
from .adjoint import odeint_adjoint
from .terms import make_cde_rhs
