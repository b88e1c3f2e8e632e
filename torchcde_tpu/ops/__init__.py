from .tridiagonal import tridiagonal_solve, tridiagonal_solve_thomas, tridiagonal_solve_pcr
from .fill import forward_fill, backward_fill, prev_observed_index, next_observed_index
