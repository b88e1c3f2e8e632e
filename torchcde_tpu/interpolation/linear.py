"""Linear and rectilinear interpolation, fully batched.

Capability parity with /root/reference/torchcde/interpolation_linear.py.  The
reference handles missing values by recursing down to scalar paths and looping
in Python over NaN runs (interpolation_linear.py:13-84, tagged
"TODO: parallelise over this"); here the infill is a single masked gather
pass — prev/next observed-index scans plus one linear blend — vectorized over
every batch and channel dimension at once, so a (8192, 4096, C) NaN-masked
batch is one fused XLA program instead of 8192*C Python loops.
"""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fill import forward_fill, masked_fill
from ..utils.misc import is_concrete, validate_input_path
from .base import InterpolationBase, register_control


def _fill_missing_linear(t, x):
    """NaN infill matching interpolation_linear.py:13-71, vectorized.

    Endpoint NaNs are imputed with the first/last observation in the channel;
    interior NaN runs are linearly interpolated in ``t`` between the
    neighbouring observations; all-NaN channels become zeros.
    x: (..., length, channels); t: (length,).

    Internally the length axis is moved last: channel counts are tiny
    (lane-wasting) while lengths are long, so scans/gathers along the minor
    axis tile far better on TPU.
    """
    xT = jnp.swapaxes(x, -1, -2)  # (..., channels, length)
    t = jnp.asarray(t) if not isinstance(t, jnp.ndarray) else t

    observed = ~jnp.isnan(xT)
    # Gather-free prev/next observed (value, time) fills: TPU gathers are
    # scalar-expensive, a select-combine scan is log2(n) vector passes (or a
    # single streaming Pallas pass for large inputs).  Endpoint imputation —
    # the reference copies the first/last observation outward
    # (interpolation_linear.py:24-45) — falls out of the same fills: before
    # the first observation, substitute the backward fill's boundary value
    # (and its time) so the blend degenerates to that constant.
    t_b = jnp.broadcast_to(t.astype(xT.dtype), xT.shape)
    safe_x = jnp.where(observed, xT, jnp.zeros_like(xT))
    xp, tp = masked_fill((safe_x, t_b), observed, axis=-1)
    xn, tn = masked_fill((safe_x, t_b), observed, axis=-1, reverse=True)

    obs_i = observed.astype(jnp.int32)
    has_prev = jax.lax.cummax(obs_i, axis=xT.ndim - 1) > 0
    has_next = jax.lax.cummax(obs_i, axis=xT.ndim - 1, reverse=True) > 0
    any_obs = has_prev[..., -1:] > 0

    xp = jnp.where(has_prev, xp, xn[..., :1])
    tp = jnp.where(has_prev, tp, tn[..., :1])
    xn = jnp.where(has_next, xn, xp[..., -1:])
    tn = jnp.where(has_next, tn, tp[..., -1:])

    denom = jnp.where(tn > tp, tn - tp, jnp.ones_like(tn))
    ratio = (t - tp) / denom
    filled = jnp.clip(ratio, 0.0, 1.0) * (xn - xp) + xp

    out = jnp.where(observed, xT, filled)
    out = jnp.where(any_obs, out, jnp.zeros_like(out))
    return jnp.swapaxes(out, -1, -2)


def _prepare_rectilinear_interpolation(data, time_index):
    """Fill-and-lag so plain linear interpolation realises the rectilinear
    ("first move in time, then in value") scheme.

    Reference: interpolation_linear.py:87-128.  Returns (..., 2L - 1, C).
    """
    n_channels = data.shape[-1]
    if not isinstance(time_index, int):
        raise ValueError(
            "Index of the time channel must be an integer in [0, {}]".format(n_channels - 1)
        )
    if not 0 <= time_index < n_channels:
        raise ValueError(
            "Time index must be in [0, {}], was given {}.".format(n_channels - 1, time_index)
        )

    times = data[..., time_index]
    if is_concrete(times) and bool(np.isnan(np.asarray(times)).any()):
        raise ValueError(
            "There exist nan values in the time column which is not allowed. If the times are "
            "padded with nans after final time, a simple solution is to forward fill the final time."
        )

    data_filled = forward_fill(data)
    data_repeat = jnp.repeat(data_filled, 2, axis=-2)
    times_rep = data_repeat[..., time_index]
    shifted_times = jnp.concatenate([times_rep[..., 1:], times_rep[..., -1:]], axis=-1)
    # Masked select instead of .at[..., idx].set: a scatter along the minor
    # channel axis costs tens of ms on TPU at batch scale; the where is one
    # fused elementwise pass.
    chan = jax.lax.broadcasted_iota(jnp.int32, data_repeat.shape, data_repeat.ndim - 1)
    data_repeat = jnp.where(chan == time_index, shifted_times[..., None], data_repeat)
    return data_repeat[..., :-1, :]


def linear_interpolation_coeffs(x, t=None, rectilinear=None):
    """Calculates the knots of the linear interpolation of the batch of controls.

    API and semantics mirror interpolation_linear.py:131-171: the returned
    "coefficients" are the NaN-infilled data itself, a plain array suitable
    for saving / dataloading, to be handed to ``LinearInterpolation``.

    Arguments:
        x: (..., length, channels) values; NaNs mark missing observations.
        t: optional 1-D strictly-increasing times; defaults to 0..length-1.
        rectilinear: optional int channel index of time within ``x``, enabling
            the causal rectilinear scheme (README.md:212-230 in the reference).
    """
    x = jnp.asarray(x)
    if rectilinear is not None:
        if is_concrete(x) and bool(np.isnan(np.asarray(x[..., 0, :])).any()):
            warnings.warn(
                "The data `x` begins with missing values in some channels. The path will be "
                "constructed by backward-filling the first observed value, which is not causal. "
                "Raising a warning as the `rectilinear` argument has also been passed, which is "
                "nearly always only used when causality is desired. If you need causality then "
                "fill in the missing value at the start of each channel with whatever you'd like "
                "it to be. (The mean over that channel is a common choice.)"
            )
        x = _prepare_rectilinear_interpolation(x, rectilinear)

    t = validate_input_path(x, t)

    if is_concrete(x) and not bool(np.isnan(np.asarray(x)).any()):
        return x  # fast path: nothing to infill
    return _fill_missing_linear(t, x)


class LinearInterpolation(InterpolationBase):
    """The piecewise-linear control path (interpolation_linear.py:174-225).

    A pytree of three arrays: knot times ``_t`` (length,), knot values
    ``_coeffs`` (..., length, channels) and precomputed slopes ``_derivs``
    (..., length - 1, channels).  Evaluation is a searchsorted gather that
    stays on-device inside the solver step loop.
    """

    _pytree_fields = ("_t", "_coeffs", "_derivs")

    def __init__(self, coeffs, t=None):
        coeffs = jnp.asarray(coeffs)
        if t is None:
            # Host NumPy constant: stays concrete under jit, keeping solver
            # step counts static (see utils.misc.validate_input_path).
            t = np.linspace(
                0, coeffs.shape[-2] - 1, coeffs.shape[-2], dtype=np.dtype(coeffs.dtype)
            )
        elif not isinstance(t, np.ndarray):
            t = jnp.asarray(t)
        self._t = t
        self._coeffs = coeffs
        self._derivs = (coeffs[..., 1:, :] - coeffs[..., :-1, :]) / (t[1:] - t[:-1])[..., None]

    @property
    def grid_points(self):
        return self._t

    @property
    def interval(self):
        from ..utils.misc import stack_endpoints

        return stack_endpoints(self._t)

    def _interpret_t(self, t):
        t = jnp.asarray(t, dtype=self._derivs.dtype)
        maxlen = self._derivs.shape[-2] - 1
        # searchsorted side='left' matches torch.bucketize(right=False)
        # (interpolation_linear.py:203-210); clamp because t may leave the
        # interval, which is fine.
        index = jnp.clip(jnp.searchsorted(self._t, jax.lax.stop_gradient(t), side="left") - 1, 0, maxlen)
        fractional_part = t - jnp.take(self._t, index)
        return fractional_part, index

    def evaluate(self, t):
        fractional_part, index = self._interpret_t(t)
        fractional_part = fractional_part[..., None]
        prev_coeff = jnp.take(self._coeffs, index, axis=-2)
        next_coeff = jnp.take(self._coeffs, index + 1, axis=-2)
        prev_t = jnp.take(self._t, index)
        next_t = jnp.take(self._t, index + 1)
        diff_t = next_t - prev_t
        return prev_coeff + fractional_part * (next_coeff - prev_coeff) / diff_t[..., None]

    def derivative(self, t):
        _, index = self._interpret_t(t)
        return jnp.take(self._derivs, index, axis=-2)


register_control(LinearInterpolation)
