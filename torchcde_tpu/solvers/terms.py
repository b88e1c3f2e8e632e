"""The CDE right-hand side: dz/dt = f(t, z) · dX/dt.

Reference: the ``_VectorField`` wrapper (/root/reference/torchcde/solver.py:103-141)
gathers X.derivative(t) and contracts it with the user vector field, with a
``func.prod`` escape hatch for a fused matrix-vector product.  Here the
contraction is an einsum so XLA maps it onto the MXU as one batched matvec
fused with the spline-derivative gather; state may be any pytree (which
subsumes the reference's tensor-or-tuple handling at solver.py:125-133).
"""

import jax.numpy as jnp


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
