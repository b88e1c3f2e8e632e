"""Per-sample adaptive step control (options={'per_sample': True}).

torchode-style stepping (arxiv 2210.12375): every batch element runs its own
error norm, PI controller and acceptance sequence, instead of torchdiffeq's
whole-batch RMS norm (the semantics the reference inherits through
torchdiffeq at solver.py:226-227).  Contracts pinned here:

* solution parity with the batch-norm controller on a well-resolved problem;
* per-sample statistics (each lane's NFE reflects its own difficulty);
* adjoint gradients flow and agree with per-sample direct backprop;
* fixed-step methods and unbatched state are rejected loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu

rng = np.random.default_rng(12)


def _problem(batch=5, length=18, channels=3, hidden=4, spread=0.6):
    x = rng.standard_normal((batch, length, channels))
    # Different per-sample magnitudes -> genuinely different step sequences.
    x *= (10.0 ** np.linspace(-spread, spread, batch))[:, None, None]
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x)
    )
    X = torchcde_tpu.CubicSpline(coeffs)
    W = jnp.asarray(rng.standard_normal((hidden, channels)) * 0.2)

    def func(t, z):
        return jnp.tanh(z)[..., None] * W

    z0 = jnp.asarray(rng.standard_normal((batch, hidden)))
    return X, func, z0, coeffs


def test_matches_batch_norm_controller():
    X, func, z0, _ = _problem()
    kwargs = dict(
        X=X, func=func, z0=z0, t=X.interval, method="dopri5",
        rtol=1e-6, atol=1e-8, max_steps=4096, adjoint=False,
    )
    ref = torchcde_tpu.cdeint(**kwargs)
    got = torchcde_tpu.cdeint(options=dict(per_sample=True), **kwargs)
    assert got.shape == ref.shape
    # The two controllers walk different meshes; they agree to within the
    # (global) integration error, not bit-exactly.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_per_sample_statistics():
    X, func, z0, _ = _problem()
    out, stats = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=X.interval, method="dopri5", adjoint=False,
        max_steps=4096, return_stats=True, options=dict(per_sample=True),
    )
    nfe = np.asarray(stats["nfe"])
    assert nfe.shape == (z0.shape[0],)
    # The magnitudes span 10^-0.6 .. 10^0.6: the easiest sample must need
    # strictly fewer evaluations than the hardest.
    assert nfe.min() < nfe.max()
    assert np.asarray(stats["steps_accepted"]).shape == (z0.shape[0],)


def test_multi_batch_dims_and_output_times():
    x = rng.standard_normal((2, 3, 16, 2))
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x)
    )
    X = torchcde_tpu.CubicSpline(coeffs)
    W = jnp.asarray(rng.standard_normal((3, 2)) * 0.2)

    def func(t, z):
        return jnp.tanh(z)[..., None] * W

    z0 = jnp.asarray(rng.standard_normal((2, 3, 3)))
    t = jnp.linspace(X.interval[0], X.interval[1], 7)
    # Tight tolerances: both controllers converge to the same trajectory
    # (at loose tolerances they differ by their legitimate mesh noise).
    out = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=t, method="dopri5", adjoint=False,
        rtol=1e-7, atol=1e-9, options=dict(per_sample=True),
    )
    assert out.shape == (2, 3, 7, 3)
    ref = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=t, method="dopri5", adjoint=False,
        rtol=1e-7, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("adjoint", [False, True])
def test_gradients(adjoint):
    X, func, z0, coeffs = _problem(batch=3, spread=0.3)

    def loss(z0_, c_):
        Xl = torchcde_tpu.CubicSpline(c_)
        o = torchcde_tpu.cdeint(
            X=Xl, func=func, z0=z0_, t=Xl.interval, method="dopri5",
            adjoint=adjoint, options=dict(per_sample=True),
        )
        return jnp.sum(o[..., -1, :] ** 2)

    g_z0, g_c = jax.grad(loss, argnums=(0, 1))(z0, coeffs)
    assert np.isfinite(np.asarray(g_z0)).all()
    assert np.isfinite(np.asarray(g_c)).all()
    assert float(jnp.max(jnp.abs(g_z0))) > 0


def test_adjoint_matches_direct():
    X, func, z0, coeffs = _problem(batch=3, spread=0.3)

    g_adj = jax.grad(
        lambda z0_: jnp.sum(
            torchcde_tpu.cdeint(
                X=X, func=func, z0=z0_, t=X.interval, method="dopri5",
                rtol=1e-8, atol=1e-10, adjoint=True,
                options=dict(per_sample=True),
            )[..., -1, :] ** 2
        )
    )(z0)
    g_dir = jax.grad(
        lambda z0_: jnp.sum(
            torchcde_tpu.cdeint(
                X=X, func=func, z0=z0_, t=X.interval, method="dopri5",
                rtol=1e-8, atol=1e-10, adjoint=False,
                options=dict(per_sample=True),
            )[..., -1, :] ** 2
        )
    )(z0)
    np.testing.assert_allclose(
        np.asarray(g_adj), np.asarray(g_dir), rtol=1e-3, atol=1e-4
    )


def test_rejects_fixed_step_and_unbatched():
    X, func, z0, _ = _problem(batch=3)
    with pytest.raises(ValueError, match="adaptive method"):
        torchcde_tpu.cdeint(
            X=X, func=func, z0=z0, t=X.interval, method="rk4",
            options=dict(per_sample=True, step_size=1.0), adjoint=False,
        )
    with pytest.raises(ValueError, match="adaptive method"):
        torchcde_tpu.cdeint(
            X=X, func=func, z0=z0, t=X.interval, method="dopri5",
            step_size=0.5, options=dict(per_sample=True), adjoint=False,
        )
    # Unbatched state: nothing to run per-sample over.
    xs = rng.standard_normal((16, 3))
    cs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(xs)
    )
    Xs = torchcde_tpu.CubicSpline(cs)
    with pytest.raises(ValueError, match="tensor state"):
        torchcde_tpu.cdeint(
            X=Xs, func=func, z0=jnp.zeros((4,)), t=Xs.interval,
            method="dopri5", options=dict(per_sample=True), adjoint=False,
        )


@pytest.mark.parametrize("adjoint", [False, True])
def test_per_sample_output_times(adjoint):
    # torchode-style per-sample integration spans: each lane reads out at
    # its own times (e.g. variable-length series ending at different t).
    X, func, z0, coeffs = _problem(batch=4, spread=0.2)
    t_end = np.asarray([8.0, 11.0, 14.0, 17.0])
    t_batched = jnp.asarray(
        np.stack([np.linspace(0.0, te, 5) for te in t_end])
    )
    out = torchcde_tpu.cdeint(
        X=X, func=func, z0=z0, t=t_batched, method="dopri5", adjoint=adjoint,
        rtol=1e-7, atol=1e-9, options=dict(per_sample=True),
    )
    assert out.shape == (4, 5, 4)
    # Every lane must match its own shared-t solve.
    for i in range(4):
        ref = torchcde_tpu.cdeint(
            X=torchcde_tpu.CubicSpline(coeffs[i : i + 1]),
            func=func, z0=z0[i : i + 1], t=t_batched[i], method="dopri5",
            adjoint=adjoint, rtol=1e-7, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref[0]), rtol=1e-4, atol=1e-5,
            err_msg=f"lane {i}",
        )


def test_batched_t_validation_and_stats_shape():
    X, func, z0, _ = _problem(batch=4, spread=0.2)
    # A non-increasing per-lane row must fail loudly, not silently return z0.
    bad_t = jnp.asarray([[0.0, 5.0], [0.0, 5.0], [5.0, 2.0], [0.0, 5.0]])
    with pytest.raises(ValueError, match="monotonically increasing"):
        torchcde_tpu.cdeint(
            X=X, func=func, z0=z0, t=bad_t, method="dopri5", adjoint=False,
            options=dict(per_sample=True),
        )

    # Multi-dim batch: per-sample statistics mirror the output's batch shape.
    x = rng.standard_normal((2, 2, 14, 2))
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x)
    )
    Xm = torchcde_tpu.CubicSpline(coeffs)
    Wm = jnp.asarray(rng.standard_normal((3, 2)) * 0.2)
    fm = lambda t, z: jnp.tanh(z)[..., None] * Wm
    z0m = jnp.asarray(rng.standard_normal((2, 2, 3)))
    out, stats = torchcde_tpu.cdeint(
        X=Xm, func=fm, z0=z0m, t=Xm.interval, method="dopri5", adjoint=False,
        return_stats=True, options=dict(per_sample=True),
    )
    assert out.shape[:2] == (2, 2)
    assert np.asarray(stats["nfe"]).shape == (2, 2)


def test_force_fused_survives_per_sample():
    # The per-lane vmap declines the fused kernels via a trace-scoped
    # thread-local, not by clobbering the user-facing force hook.
    from torchcde_tpu.solvers import fused_pallas

    X, func, z0, _ = _problem(batch=3, spread=0.2)
    fused_pallas.force_fused_pallas(True)
    try:
        torchcde_tpu.cdeint(
            X=X, func=func, z0=z0, t=X.interval, method="dopri5",
            adjoint=False, options=dict(per_sample=True),
        )
        assert fused_pallas._FORCE is True
    finally:
        fused_pallas.force_fused_pallas(None)


@pytest.mark.slow
@pytest.mark.parametrize("adjoint", [False, True])
def test_fused_per_sample_kernel_matches_xla_path(adjoint):
    """The fused per-lane dopri5 kernel (fused_dopri_persample.py, interpret
    mode here) vs the vmapped XLA per-sample path: same per-sample
    controller design, different f32 realisations of the mesh — values
    agree to solution accuracy and gradients flow to z0/params/coeffs."""
    from torchcde_tpu.solvers import fused_pallas
    from torchcde_tpu.solvers.terms import MLPVectorField

    B, L, C, H, W = 4, 7, 3, 4, 8
    x = rng.standard_normal((B, L, C))
    x *= (10.0 ** np.linspace(-0.4, 0.4, B))[:, None, None]
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x).astype(jnp.float32))
    w1 = jnp.asarray(rng.standard_normal((H, W)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((W,)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((W, H * C)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((H * C,)) * 0.3, jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    t = np.asarray([0.0, 2.5, 6.0])

    def loss(args, coeffs, use_fused):
        z0_, w1_, b1_, w2_, b2_ = args
        fused_pallas.force_fused_pallas(True if use_fused else False)
        try:
            X = torchcde_tpu.CubicSpline(coeffs)
            field = MLPVectorField(w1_, b1_, w2_, b2_, H, C)
            out = torchcde_tpu.cdeint(
                X=X, func=field, z0=z0_, t=t, adjoint=adjoint,
                method="dopri5", rtol=1e-6, atol=1e-8,
                options=dict(per_sample=True))
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out)), out

    args = (z0, w1, b1, w2, b2)
    (_, out_ref), g_ref = jax.value_and_grad(loss, argnums=0, has_aux=True)(
        args, coeffs, False)
    (_, out_fp), g_fp = jax.value_and_grad(loss, argnums=0, has_aux=True)(
        args, coeffs, True)
    assert out_fp.shape == out_ref.shape == (B, 3, H)
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(out_ref),
                               rtol=2e-3, atol=2e-3)
    # Gradients: frozen-mesh on slightly different meshes -> a few-percent
    # relative-norm agreement per leaf.
    for a, b in zip(jax.tree_util.tree_leaves(g_fp),
                    jax.tree_util.tree_leaves(g_ref)):
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        denom = max(float(np.linalg.norm(b)), 1e-8)
        assert float(np.linalg.norm(a - b)) / denom < 0.05, (a, b)


@pytest.mark.slow
def test_fused_per_sample_coefficient_gradients():
    from torchcde_tpu.solvers import fused_pallas
    from torchcde_tpu.solvers.terms import MLPVectorField

    B, L, C, H, W = 3, 6, 2, 3, 8
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x))
    w1 = jnp.asarray(rng.standard_normal((H, W)) * 0.3, jnp.float32)
    b1 = jnp.zeros((W,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((W, H * C)) * 0.3, jnp.float32)
    b2 = jnp.zeros((H * C,), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    field = MLPVectorField(w1, b1, w2, b2, H, C)
    t = np.asarray([0.0, 5.0])

    def loss(coeffs, use_fused):
        fused_pallas.force_fused_pallas(True if use_fused else False)
        try:
            X = torchcde_tpu.CubicSpline(coeffs)
            out = torchcde_tpu.cdeint(
                X=X, func=field, z0=z0, t=t, adjoint=False, method="dopri5",
                rtol=1e-5, atol=1e-7, options=dict(per_sample=True))
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(out[..., -1, :])

    gc_fp = jax.grad(loss)(coeffs, True)
    gc_ref = jax.grad(loss)(coeffs, False)
    a = np.asarray(gc_fp, np.float64).ravel()
    b = np.asarray(gc_ref, np.float64).ravel()
    assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-8) < 0.05


@pytest.mark.slow
def test_fused_per_sample_chunked_long_table():
    """Round-5 cap lift: coefficient tables longer than one VMEM chunk
    stream through the per-lane kernel as carried (state, t, dt) rows —
    values and gradients still match the vmapped XLA path."""
    from torchcde_tpu.solvers import fused_dopri_persample as fdps
    from torchcde_tpu.solvers import fused_pallas
    from torchcde_tpu.solvers.terms import MLPVectorField

    B, L, C, H, W = 3, 14, 2, 3, 8  # 13 intervals
    x = rng.standard_normal((B, L, C)).astype(np.float32) * 0.4
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x))
    w1 = jnp.asarray(rng.standard_normal((H, W)) * 0.3, jnp.float32)
    b1 = jnp.zeros((W,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((W, H * C)) * 0.3, jnp.float32)
    b2 = jnp.zeros((H * C,), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    t = np.asarray([0.0, 3.3, 9.0, 13.0])

    orig = fdps.MAX_PS_INTERVALS
    fdps.MAX_PS_INTERVALS = 4  # 13 intervals -> 4 carried chunks
    try:
        def loss(args, coeffs, use_fused):
            z0_, w1_, w2_ = args
            fused_pallas.force_fused_pallas(True if use_fused else False)
            try:
                X = torchcde_tpu.CubicSpline(coeffs)
                field = MLPVectorField(w1_, b1, w2_, b2, H, C)
                out = torchcde_tpu.cdeint(
                    X=X, func=field, z0=z0_, t=t, adjoint=False,
                    method="dopri5", rtol=1e-6, atol=1e-8,
                    options=dict(per_sample=True))
            finally:
                fused_pallas.force_fused_pallas(None)
            return jnp.sum(jnp.sin(out)), out

        # The fused path must actually route under the tightened cap.
        fused_pallas.force_fused_pallas(True)
        try:
            routed = fdps.try_fused_dopri5_per_sample(
                torchcde_tpu.CubicSpline(coeffs),
                MLPVectorField(w1, b1, w2, b2, H, C), z0, t,
                rtol=1e-6, atol=1e-8, max_steps=None)
        finally:
            fused_pallas.force_fused_pallas(None)
        assert routed is not None

        args = (z0, w1, w2)
        (_, out_ref), g_ref = jax.value_and_grad(
            loss, argnums=0, has_aux=True)(args, coeffs, False)
        (_, out_fp), g_fp = jax.value_and_grad(
            loss, argnums=0, has_aux=True)(args, coeffs, True)
    finally:
        fdps.MAX_PS_INTERVALS = orig

    assert out_fp.shape == out_ref.shape == (B, 4, H)
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(out_ref),
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_fp),
                    jax.tree_util.tree_leaves(g_ref)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-8) < 0.05


@pytest.mark.slow
def test_fused_per_sample_batched_t_rows():
    """Round-5 cap lift: batched per-lane output times (torchode's t_eval)
    route INTO the kernel as per-lane VMEM rows instead of declining to the
    13x-slower vmapped path."""
    from torchcde_tpu.solvers import fused_dopri_persample as fdps
    from torchcde_tpu.solvers import fused_pallas
    from torchcde_tpu.solvers.terms import MLPVectorField

    B, L, C, H, W = 4, 8, 2, 3, 8
    x = rng.standard_normal((B, L, C)).astype(np.float32) * 0.4
    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(
        jnp.asarray(x))
    w1 = jnp.asarray(rng.standard_normal((H, W)) * 0.3, jnp.float32)
    b1 = jnp.zeros((W,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((W, H * C)) * 0.3, jnp.float32)
    b2 = jnp.zeros((H * C,), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    # Every lane integrates over and reads out at its own span.
    ends = np.linspace(3.0, 7.0, B)
    t_rows = np.stack([np.linspace(0.0, e, 5) for e in ends])

    fused_pallas.force_fused_pallas(True)
    try:
        routed = fdps.try_fused_dopri5_per_sample(
            torchcde_tpu.CubicSpline(coeffs),
            MLPVectorField(w1, b1, w2, b2, H, C), z0, None,
            rtol=1e-6, atol=1e-8, max_steps=None,
            t_rows=jnp.asarray(t_rows, jnp.float32))
    finally:
        fused_pallas.force_fused_pallas(None)
    assert routed is not None and routed.shape == (5, B, H)

    def loss(args, coeffs, use_fused):
        z0_, w1_, w2_ = args
        fused_pallas.force_fused_pallas(True if use_fused else False)
        try:
            X = torchcde_tpu.CubicSpline(coeffs)
            field = MLPVectorField(w1_, b1, w2_, b2, H, C)
            out = torchcde_tpu.cdeint(
                X=X, func=field, z0=z0_, t=jnp.asarray(t_rows, jnp.float32),
                adjoint=False, method="dopri5", rtol=1e-6, atol=1e-8,
                options=dict(per_sample=True))
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out)), out

    args = (z0, w1, w2)
    (_, out_ref), g_ref = jax.value_and_grad(
        loss, argnums=0, has_aux=True)(args, coeffs, False)
    (_, out_fp), g_fp = jax.value_and_grad(
        loss, argnums=0, has_aux=True)(args, coeffs, True)
    assert out_fp.shape == out_ref.shape == (B, 5, H)
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(out_ref),
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_fp),
                    jax.tree_util.tree_leaves(g_ref)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-8) < 0.05


@pytest.mark.slow
def test_fused_per_sample_linear_control():
    """LinearInterpolation controls route to the per-lane kernel (slope-only
    slabs, left-continuous interval selection at knots)."""
    from torchcde_tpu.solvers import fused_dopri_persample as fdps
    from torchcde_tpu.solvers import fused_pallas
    from torchcde_tpu.solvers.terms import MLPVectorField

    B, L, C, H, W = 3, 7, 2, 3, 8
    x = rng.standard_normal((B, L, C)).astype(np.float32) * 0.4
    coeffs = torchcde_tpu.linear_interpolation_coeffs(jnp.asarray(x))
    w1 = jnp.asarray(rng.standard_normal((H, W)) * 0.3, jnp.float32)
    b1 = jnp.zeros((W,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((W, H * C)) * 0.3, jnp.float32)
    b2 = jnp.zeros((H * C,), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    t = np.asarray([0.0, 2.0, 6.0])  # t=2.0 sits ON a knot: left-continuity

    from torchcde_tpu.interpolation.linear import LinearInterpolation

    fused_pallas.force_fused_pallas(True)
    try:
        routed = fdps.try_fused_dopri5_per_sample(
            LinearInterpolation(coeffs),
            MLPVectorField(w1, b1, w2, b2, H, C), z0, t,
            rtol=1e-6, atol=1e-8, max_steps=None)
    finally:
        fused_pallas.force_fused_pallas(None)
    assert routed is not None

    def loss(coeffs, use_fused):
        fused_pallas.force_fused_pallas(True if use_fused else False)
        try:
            X = LinearInterpolation(coeffs)
            field = MLPVectorField(w1, b1, w2, b2, H, C)
            out = torchcde_tpu.cdeint(
                X=X, func=field, z0=z0, t=t, adjoint=False,
                method="dopri5", rtol=1e-6, atol=1e-8,
                options=dict(per_sample=True))
        finally:
            fused_pallas.force_fused_pallas(None)
        return jnp.sum(jnp.sin(out)), out

    (_, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(coeffs, False)
    (_, out_fp), g_fp = jax.value_and_grad(loss, has_aux=True)(coeffs, True)
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(out_ref),
                               rtol=2e-3, atol=2e-3)
    a = np.asarray(g_fp, np.float64).ravel()
    b = np.asarray(g_ref, np.float64).ravel()
    assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-8) < 0.05


def test_lane_dx_lead_keeps_left_continuity_at_chunk_boundary():
    """Chunk streaming with linear controls: a stage landing EXACTLY on the
    chunk-boundary knot (every clamped step produces one) must read the
    LEFT interval's slope, matching the reference's bucketize convention
    and the unchunked kernel.  Chunks after the first carry one extra
    leading interval (slab 0 = previous chunk's last interval) and select
    with ceil(pos) instead of ceil(pos)-1 (``lead=True``)."""
    from torchcde_tpu.solvers.fused_dopri_persample import _lane_dx

    C, tile = 1, 4
    # Global table: slope of interval j is j+1 (intervals 0..3, knots 0..4).
    def table(js):
        n = len(js)
        ct3 = np.zeros((n, 16, tile), np.float32)
        for row, j in enumerate(js):
            ct3[row, 0, :] = j + 1.0
        return jnp.asarray(ct3), jax.lax.broadcasted_iota(
            jnp.int32, (n, 1, tile), 0)

    tval = jnp.full((1, tile), 2.0, jnp.float32)  # exactly knot 2

    # Unchunked reference: t0g=0, intervals 0..3 -> left-continuity reads
    # interval 1 (slope 2).
    ct3, iota = table([0, 1, 2, 3])
    dx, _, _ = _lane_dx(ct3, iota, tval, 0.0, 1.0, 4, C, linear=True)
    assert float(dx[0, 0]) == 2.0

    # Chunk starting at knot 2 WITHOUT the lead interval: clips to the
    # right slope (3) — the bug the lead slab exists to fix.
    ct3, iota = table([2, 3])
    dx, _, _ = _lane_dx(ct3, iota, tval, 2.0, 1.0, 2, C, linear=True)
    assert float(dx[0, 0]) == 3.0

    # Same chunk WITH the carried lead interval: left slope (2), and times
    # strictly inside the chunk still read their own interval.
    ct3, iota = table([1, 2, 3])
    dx, _, _ = _lane_dx(ct3, iota, tval, 2.0, 1.0, 3, C, linear=True,
                        lead=True)
    assert float(dx[0, 0]) == 2.0
    t_mid = jnp.full((1, tile), 2.5, jnp.float32)
    dx, _, _ = _lane_dx(ct3, iota, t_mid, 2.0, 1.0, 3, C, linear=True,
                        lead=True)
    assert float(dx[0, 0]) == 3.0
