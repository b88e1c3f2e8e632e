"""Handling irregular data with Neural CDEs — preprocessing is everything.

Capability parity with /root/reference/example/irregular_data.py: the three
kinds of "irregularity" — irregular sampling, missing values, variable-length
sequences — are all handled offline in L2 preprocessing; the model and solver
never see them.  The key facts (reference irregular_data.py:167-184):

* CDEs are reparameterisation-invariant, so the solver's time axis need not
  be observation time — time is just another data channel;
* appending cumulative observation-mask channels tells the model *when* each
  channel was observed;
* fill-forward padding to a common length makes dX/dt = 0 past a sequence's
  end, freezing the hidden state — so batching variable lengths is free.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchcde_tpu
from torchcde_tpu.models.neural_cde import NeuralCDEConfig, init_neural_cde, neural_cde_apply


def irregular_data(seed=0):
    """A batch of 3 time series with per-channel observation times, missing
    values, and different lengths."""
    rng = np.random.default_rng(seed)
    batch = []
    for _ in range(3):
        length = int(rng.integers(5, 10))
        t = np.sort(rng.random(length)) * 5
        x1 = np.where(rng.random(length) < 0.7, rng.standard_normal(length), np.nan)
        x2 = np.where(rng.random(length) < 0.7, rng.standard_normal(length), np.nan)
        batch.append((t, x1, x2))
    return batch


def process_batch(batch):
    """Merge per-element channels onto a common padded grid with time and
    cumulative-observation channels (reference irregular_data.py:93-124)."""
    processed = []
    max_len = max(len(t) for t, _x1, _x2 in batch)
    for t, x1, x2 in batch:
        obs1 = np.cumsum(~np.isnan(x1)).astype(np.float64)
        obs2 = np.cumsum(~np.isnan(x2)).astype(np.float64)
        row = np.stack([t, x1, x2, obs1, obs2], axis=-1)
        if len(t) < max_len:
            # Fill-forward padding: repeat the final row, so dX/dt = 0 past
            # the end and the hidden state freezes.
            pad = np.repeat(row[-1:], max_len - len(t), axis=0)
            row = np.concatenate([row, pad], axis=0)
        processed.append(row)
    return np.stack(processed)


def main():
    batch = irregular_data()
    x = jnp.asarray(process_batch(batch))
    print("padded batch shape:", x.shape)

    coeffs = torchcde_tpu.hermite_cubic_coefficients_with_backward_differences(x)
    cfg = NeuralCDEConfig(
        input_channels=x.shape[-1], hidden_channels=8, output_channels=1,
        interpolation="cubic", solver="dopri5", adjoint=False,
    )
    params = init_neural_cde(jax.random.PRNGKey(0), cfg)
    pred = neural_cde_apply(params, cfg, coeffs)
    print("predictions:", np.asarray(pred).ravel())

    # Rectilinear (fully causal) variant for online inference
    # (reference README.md:212-230): time must be a channel; NaN times are
    # forward-filled first.
    x_rect = torchcde_tpu.linear_interpolation_coeffs(x, rectilinear=0)
    X = torchcde_tpu.LinearInterpolation(x_rect)
    cfg_lin = NeuralCDEConfig(
        input_channels=x.shape[-1], hidden_channels=8, output_channels=1,
        interpolation="linear", solver="rk4", adjoint=False, step_size=1.0,
    )
    params_lin = init_neural_cde(jax.random.PRNGKey(1), cfg_lin)
    pred_lin = neural_cde_apply(params_lin, cfg_lin, x_rect)
    print("rectilinear predictions:", np.asarray(pred_lin).ravel())

    # Variable lengths WITHOUT padding tricks: per-sample integration spans.
    # options={'per_sample': True} gives each sample its own adaptive
    # controller AND its own output times, so every sequence integrates
    # exactly to its own final observation (and a stiff sample doesn't set
    # the whole batch's step size).
    X_cubic = torchcde_tpu.CubicSpline(coeffs)
    t_ends = jnp.asarray([float(len(t) - 1) for t, _x1, _x2 in batch])
    t_spans = jnp.stack([jnp.zeros_like(t_ends), t_ends], axis=-1)
    z0 = 0.1 + jnp.zeros((x.shape[0], 8))

    def field(t, z):
        return jnp.tanh(z)[..., None] * jnp.ones((1, x.shape[-1]))

    z_T = torchcde_tpu.cdeint(
        X=X_cubic, func=field, z0=z0, t=t_spans, method="dopri5",
        adjoint=False, options=dict(per_sample=True),
    )
    print("per-sample terminal states:", np.asarray(z_T[:, -1, 0]).ravel())
    return pred


if __name__ == "__main__":
    main()
