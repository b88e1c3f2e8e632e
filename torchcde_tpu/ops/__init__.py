from .tridiagonal import tridiagonal_solve, tridiagonal_solve_thomas, tridiagonal_solve_pcr
from .fill import forward_fill, backward_fill, prev_observed_index, next_observed_index
from .tridiagonal_pallas import tridiagonal_solve_pallas
from .logsignature import (
    logsignature_channels,
    lyndon_words,
    path_logsignature,
    path_signature,
    windowed_logsignatures,
)
