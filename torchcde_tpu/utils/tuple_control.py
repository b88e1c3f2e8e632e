"""Batching several controls into one (reference misc.py:129-166).

Enables tuple-state CDEs: tuple z0, tuple vector fields, tuple controls,
flowing through ``cdeint`` as a pytree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..interpolation.base import InterpolationBase
from ..utils.misc import is_concrete


class TupleControl(InterpolationBase):
    def __init__(self, *controls):
        if len(controls) == 0:
            raise ValueError("Expected one or more controls to batch together.")

        interval = controls[0].interval
        grid_points = controls[0].grid_points
        same_grid_points = True
        for control in controls[1:]:
            if is_concrete(interval) and is_concrete(control.interval):
                if bool(np.any(np.asarray(control.interval) != np.asarray(interval))):
                    raise ValueError("Can only batch together controls over the same interval.")
            if same_grid_points:
                other = control.grid_points
                if other.shape != grid_points.shape:
                    same_grid_points = False
                elif is_concrete(grid_points) and is_concrete(other):
                    if bool(np.any(np.asarray(other) != np.asarray(grid_points))):
                        same_grid_points = False

        self.controls = tuple(controls)
        self._same_grid_points = same_grid_points

    @property
    def interval(self):
        return self.controls[0].interval

    @property
    def grid_points(self):
        if not self._same_grid_points:
            raise RuntimeError("Batch of controls have different grid points.")
        return self.controls[0].grid_points

    def evaluate(self, t):
        return tuple(control.evaluate(t) for control in self.controls)

    def derivative(self, t):
        return tuple(control.derivative(t) for control in self.controls)


def _flatten(obj):
    return obj.controls, obj._same_grid_points


def _unflatten(aux, children):
    obj = object.__new__(TupleControl)
    obj.controls = tuple(children)
    obj._same_grid_points = aux
    return obj


jax.tree_util.register_pytree_node(TupleControl, _flatten, _unflatten)
