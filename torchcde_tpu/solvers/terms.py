"""The CDE right-hand side: dz/dt = f(t, z) · dX/dt.

Reference: the ``_VectorField`` wrapper (/root/reference/torchcde/solver.py:103-141)
gathers X.derivative(t) and contracts it with the user vector field, with a
``func.prod`` escape hatch for a fused matrix-vector product.  Here the
contraction is an einsum so XLA maps it onto the MXU as one batched matvec
fused with the spline-derivative gather; state may be any pytree (which
subsumes the reference's tensor-or-tuple handling at solver.py:125-133).
"""

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class MLPVectorField:
    """The canonical Neural CDE vector field — Linear -> ReLU -> Linear ->
    tanh, reshaped to (..., hidden, input) (reference
    time_series_classification.py:20-51) — as a *recognizable* pytree callable.

    Any plain closure with the same math works everywhere in ``cdeint``; this
    class additionally lets the fixed-step fast path fuse the entire solve
    into one Pallas TPU kernel (solvers/fused_pallas.py), because the kernel
    needs the MLP's structure, not just a black-box callable.
    """

    def __init__(self, w1, b1, w2, b2, hidden_channels, input_channels):
        self.w1, self.b1, self.w2, self.b2 = w1, b1, w2, b2
        self.hidden_channels = int(hidden_channels)
        self.input_channels = int(input_channels)

    def tree_flatten(self):
        return ((self.w1, self.b1, self.w2, self.b2),
                (self.hidden_channels, self.input_channels))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def __call__(self, t, z):
        h = jnp.maximum(z @ self.w1 + self.b1, 0.0)
        h = jnp.tanh(h @ self.w2 + self.b2)
        return h.reshape(h.shape[:-1] + (self.hidden_channels, self.input_channels))


def _matvec(vector_field, control_gradient):
    # (..., hidden, input) @ (..., input) -> (..., hidden), batch dims
    # broadcasting — identical semantics to the squeeze/unsqueeze matmul at
    # solver.py:126-130.
    #
    # CDE input/hidden channel counts are typically tiny (3-30), far below an
    # MXU tile; XLA:TPU lowers such batched matvecs by promoting the batch
    # dimension to a free matmul dimension, materialising a catastrophic
    # (batch, batch, hidden) temp.  A VPU multiply-reduce is both smaller and
    # faster there, so it is the default; genuinely large contractions go to
    # the MXU via einsum.
    if vector_field.shape[-1] * vector_field.shape[-2] <= 4096:
        return jnp.sum(vector_field * control_gradient[..., None, :], axis=-1)
    return jnp.einsum("...hi,...i->...h", vector_field, control_gradient)


def make_cde_rhs(func, X):
    """Builds rhs(t, z) = f(t, z) · dX/dt for the ODE reduction of the CDE."""
    is_prod = hasattr(func, "prod")

    def rhs(t, z):
        control_gradient = X.derivative(t)
        if is_prod:
            return func.prod(t, z, control_gradient)
        vector_field = func(t, z)
        if isinstance(z, (tuple, list)):
            return type(z)(
                _matvec(vf, cg) for vf, cg in zip(vector_field, control_gradient)
            )
        return _matvec(vector_field, control_gradient)

    return rhs
