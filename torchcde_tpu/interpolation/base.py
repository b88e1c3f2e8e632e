"""The control-path protocol.

Reference: /root/reference/torchcde/interpolation_base.py:5-22 defines an
``InterpolationBase(torch.nn.Module)`` ABC with ``grid_points``, ``interval``,
``evaluate`` and ``derivative``.  The TPU-native equivalent is a *pytree
dataclass*: controls hold plain jnp arrays, flatten/unflatten transparently
through jit/vmap/grad/sharding, and need no module machinery.  ``cdeint``
duck-types on ``.derivative`` exactly as the reference does
(/root/reference/torchcde/solver.py:45-47).
"""

import abc

import jax


class InterpolationBase(abc.ABC):
    """Abstract control path: a continuous X(t) with a derivative."""

    @property
    @abc.abstractmethod
    def grid_points(self):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def interval(self):
        raise NotImplementedError

    @abc.abstractmethod
    def evaluate(self, t):
        raise NotImplementedError

    @abc.abstractmethod
    def derivative(self, t):
        raise NotImplementedError


def register_control(cls, fields=None):
    """Registers a control class as a JAX pytree with ``fields`` as leaves.

    This is the functional analogue of the reference's buffer registration
    (/root/reference/torchcde/interpolation_cubic.py:300-305): the arrays ride
    along through transformations and checkpointing because they *are* the
    tree leaves.  Unflattening bypasses ``__init__`` so no computation is
    re-run (and placeholder leaves during tracing are tolerated).
    """
    if fields is None:
        fields = list(cls._pytree_fields)

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for name, child in zip(fields, children):
            object.__setattr__(obj, name, child)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
