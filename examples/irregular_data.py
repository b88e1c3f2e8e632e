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
    return pred


if __name__ == "__main__":
    main()
