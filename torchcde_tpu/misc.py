"""Compatibility module mirroring the reference's ``torchcde.misc`` surface.

The reference treats ``torchcde.misc`` as quasi-public: its own tests import
``torchcde.misc`` directly (test/test_misc.py:2) and use
``torchcde.misc.forward_fill`` (test/test_linear_interpolation.py:133).  Users
migrating from the reference get the same names here.
"""

from .ops.fill import forward_fill
from .ops.tridiagonal import (
    tridiagonal_solve,
    tridiagonal_solve_pcr,
    tridiagonal_solve_thomas,
)
from .utils.misc import cheap_stack, validate_input_path
from .utils.tuple_control import TupleControl

__all__ = [
    "cheap_stack",
    "forward_fill",
    "tridiagonal_solve",
    "tridiagonal_solve_pcr",
    "tridiagonal_solve_thomas",
    "validate_input_path",
    "TupleControl",
]
