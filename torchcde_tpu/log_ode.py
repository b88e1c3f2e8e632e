"""The log-ODE method: windowed logsignature transform for long series.

Capability parity with /root/reference/torchcde/log_ode.py — compress a long
series into ``length/window`` steps of ``logsignature_channels(c, depth)``
channels each ("the extra channels can be parallelised, but extra length
cannot", reference README.md:272-276) — without the external signatory
dependency: logsignatures come from ``ops.logsignature`` (one batched Chen
associative scan for *all* windows, instead of the reference's Python loop
over per-window signatory calls at log_ode.py:57-67).

This is offline preprocessing (the reference warns to cache it); the time
grid must be concrete (not jit-traced), mirroring the host-side window/grid
alignment at log_ode.py:25-38.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .interpolation.linear import linear_interpolation_coeffs
from .ops.logsignature import logsignature_channels, windowed_logsignatures
from .utils.misc import is_concrete, validate_input_path


def _merge_window_grid(t_np, window_length):
    """Builds the window-boundary grid and merges it into the data times.

    Mirrors log_ode.py:18-38: boundaries at t0 + k*window_length (last one
    clamped to t[-1]); boundaries already (nearly) present in ``t`` are not
    duplicated.  Returns (merged_times, boundary_positions, new_t).
    """
    t0, t_last = t_np[0], t_np[-1]
    num_pieces = int(math.ceil((t_last - t0) / window_length - 1e-12))
    end_t = t0 + num_pieces * window_length
    new_t = np.linspace(t0, end_t, num_pieces + 1)
    new_t = np.minimum(new_t, t_np.max())

    # Vectorised equivalent of walking t for each boundary until
    # new_t_elem <= t[i] or allclose(new_t_elem, t[i]) (a Python loop with a
    # per-element allclose costs ~170 ms at length 10k): the stop index is
    # the first t at least new_t - allclose_tol, found by one searchsorted.
    tol = 1e-8 + 1e-5 * np.abs(new_t)
    t_index = np.searchsorted(t_np, new_t - tol, side="left")
    t_index = np.minimum(t_index, len(t_np) - 1)
    close = np.isclose(new_t, t_np[t_index])
    inserts_before = np.concatenate([[0], np.cumsum(~close)[:-1]])
    boundary_positions = t_index + inserts_before
    insert_times = new_t[~close]

    if insert_times.size:
        merged = np.sort(np.concatenate([t_np, insert_times]))
    else:
        merged = t_np
    return merged, np.asarray(boundary_positions, dtype=np.int64), new_t


def _logsignature_windows(x, depth, window_length, t, _version):
    if not isinstance(depth, int) or depth < 1:
        raise ValueError(f"depth must be a positive integer, got {depth!r}")
    if not float(window_length) > 0:
        raise ValueError(f"window_length must be positive, got {window_length!r}")
    x = jnp.asarray(x)
    t = validate_input_path(x, t)
    if not (is_concrete(t) and is_concrete(x)):
        raise ValueError(
            "logsig_windows is offline preprocessing and requires concrete "
            "(non-traced) inputs, like the reference's host-side window "
            "alignment (log_ode.py:25-38). Precompute it outside jit."
        )
    t_np = np.asarray(t, dtype=np.float64)
    merged_t, boundaries, new_t = _merge_window_grid(t_np, float(window_length))

    # Insert rows at the new times, filled linearly — linear because that is
    # what signatures do between observations anyway (log_ode.py:47-49).  For
    # NaN-free data the inserted rows are blended on the host right here (two
    # vectorized gathers), so the device program needs no infill pass at all;
    # data with genuinely missing values takes the masked device infill.
    # (np.asarray on a device-resident x is a sub-ms transfer at these sizes
    # — this is host-side offline preprocessing either way.)
    x_np = np.asarray(x)
    needs_infill = bool(np.isnan(x_np).any())
    if merged_t.shape[0] != t_np.shape[0]:
        insert_mask = ~np.isin(merged_t, t_np)
        full = np.full(x_np.shape[:-2] + (merged_t.shape[0], x_np.shape[-1]), np.nan,
                       dtype=x_np.dtype)
        full[..., ~insert_mask, :] = x_np
        if not needs_infill:
            ins_t = merged_t[insert_mask]
            j = np.clip(np.searchsorted(t_np, ins_t, side="right") - 1,
                        0, t_np.shape[0] - 2)
            frac = ((ins_t - t_np[j]) / (t_np[j + 1] - t_np[j])).astype(x_np.dtype)
            full[..., insert_mask, :] = (
                (1 - frac[:, None]) * x_np[..., j, :] + frac[:, None] * x_np[..., j + 1, :]
            )
        x = jnp.asarray(full)
    merged_t_j = jnp.asarray(merged_t, dtype=x.dtype)
    if _version == 0:
        widths = jnp.asarray(new_t[1:] - new_t[:-1], dtype=x.dtype)
    else:
        widths = None
    # One compiled program for the whole device-side pipeline (eager op-by-op
    # execution pays a dispatch round-trip per op on remote backends).
    out = _device_logsig_windows(
        x, merged_t_j, widths, depth, tuple(boundaries), needs_infill
    )

    if _version == 0:
        return out, jnp.asarray(new_t, dtype=x.dtype)
    return out


@partial(jax.jit, static_argnames=("depth", "boundaries", "needs_infill"))
def _device_logsig_windows(x, merged_t, widths, depth, boundaries, needs_infill=True):
    if needs_infill:
        x = linear_interpolation_coeffs(x, merged_t)

    batch_shape = x.shape[:-2]
    channels = x.shape[-1]
    n_logsig = logsignature_channels(channels, depth)

    logsigs = windowed_logsignatures(x, depth, np.asarray(boundaries, dtype=np.int64))
    if widths is not None:
        logsigs = logsigs * widths[..., :, None]

    # The first "increment" carries the initial position X(t0), padded into
    # logsignature channels (log_ode.py:53-55).
    first = jnp.zeros(batch_shape + (1, n_logsig), dtype=x.dtype)
    first = first.at[..., 0, :channels].set(x[..., 0, :])

    out = jnp.concatenate([first, logsigs], axis=-2)
    return jnp.cumsum(out, axis=-2)  # increments ARE the logsignatures


def logsignature_windows(x, depth, window_length, t=None):
    """DEPRECATED: kept for API parity (reference log_ode.py:80-107).

    Returns (values, times); window logsignatures are rescaled by window
    width (_version=0).
    """
    return _logsignature_windows(x, depth, window_length, t, _version=0)


def logsig_windows(x, depth, window_length, t=None):
    """Windowed logsignature transform (reference log_ode.py:110-133).

    x: (..., length, channels) with NaNs for missing values; depth: signature
    truncation depth; window_length: time span per window; t: optional 1-D
    times.  Returns values (..., n_windows + 1, logsignature_channels) on an
    implicit 0..n grid, ready for ``linear_interpolation_coeffs``.
    """
    return _logsignature_windows(x, depth, window_length, t, _version=1)
