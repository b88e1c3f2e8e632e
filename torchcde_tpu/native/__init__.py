"""Native host-side preprocessing runtime (C++ via ctypes).

The data-loader-side counterpart to the JAX kernels: coefficient construction
on the host CPU (multithreaded C++), overlapping with TPU compute, with a
transparent fall-back to the JAX implementations when the shared library is
not built.  Build happens lazily on first use (g++ is in the image); the
compiled ``libcdehost.so`` is cached next to the sources.

Public surface:
    available() -> bool
    thomas_solve(b, u, d, l)            (batched, f32/f64)
    forward_fill(x)
    linear_infill(t, x)
    natural_cubic_dense(t, x) -> packed (a, b, 2c, 3d) coeffs
    hermite_coeffs(t, x)      -> packed coeffs
    lyndon_words(channels, depth)
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "cdehost.cpp")
_LIB = os.path.join(_HERE, "libcdehost.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _default_threads():
    return max(1, os.cpu_count() or 1)


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            _lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


def _suffix(dtype):
    if dtype == np.float32:
        return "f32"
    if dtype == np.float64:
        return "f64"
    raise TypeError(f"Unsupported dtype {dtype}")


def thomas_solve(b, u, d, l, n_threads=None):
    """Batched tridiagonal solve on the host.  b, d: (..., k); u, l: (..., k-1)."""
    lib = _load()
    b = np.ascontiguousarray(b)
    dt = b.dtype.type
    u = np.ascontiguousarray(np.broadcast_to(u, b.shape[:-1] + (b.shape[-1] - 1,)), dtype=dt)
    d = np.ascontiguousarray(np.broadcast_to(d, b.shape), dtype=dt)
    l = np.ascontiguousarray(np.broadcast_to(l, b.shape[:-1] + (b.shape[-1] - 1,)), dtype=dt)
    k = b.shape[-1]
    n = int(np.prod(b.shape[:-1], dtype=np.int64)) if b.ndim > 1 else 1
    if lib is None:
        from ..ops.tridiagonal import tridiagonal_solve_thomas
        import jax.numpy as jnp

        return np.asarray(tridiagonal_solve_thomas(jnp.asarray(b), jnp.asarray(u),
                                                   jnp.asarray(d), jnp.asarray(l)))
    out = np.empty_like(b)
    fn = getattr(lib, f"thomas_solve_batch_{_suffix(b.dtype.type)}")
    fn(_ptr(b.reshape(n, k)), _ptr(u.reshape(n, k - 1)), _ptr(d.reshape(n, k)),
       _ptr(l.reshape(n, k - 1)), _ptr(out.reshape(n, k)),
       ctypes.c_int64(n), ctypes.c_int64(k),
       ctypes.c_int(n_threads or _default_threads()))
    return out


def _batched_call(name, t, x, out_last_dim_factor=1, out_rows_delta=0, n_threads=None):
    lib = _load()
    x = np.ascontiguousarray(x)
    t = np.ascontiguousarray(t, dtype=x.dtype)
    if t.shape != (x.shape[-2],):
        # The C++ kernels trust shapes; validate here or they read OOB.
        raise ValueError(
            f"t must be 1-D with length {x.shape[-2]} (the data's time "
            f"dimension); got shape {t.shape}"
        )
    L, C = x.shape[-2], x.shape[-1]
    n = int(np.prod(x.shape[:-2], dtype=np.int64)) if x.ndim > 2 else 1
    out_shape = x.shape[:-2] + (L + out_rows_delta, C * out_last_dim_factor)
    out = np.empty(out_shape, dtype=x.dtype)
    fn = getattr(lib, f"{name}_{_suffix(x.dtype.type)}")
    fn(_ptr(t), _ptr(x.reshape(n, L, C)), _ptr(out.reshape(n, *out_shape[-2:])),
       ctypes.c_int64(n), ctypes.c_int64(L), ctypes.c_int64(C),
       ctypes.c_int(n_threads or _default_threads()))
    return out


def forward_fill(x, n_threads=None):
    lib = _load()
    x = np.ascontiguousarray(x)
    if lib is None:
        from ..ops.fill import forward_fill as jff
        import jax.numpy as jnp

        return np.asarray(jff(jnp.asarray(x)))
    L, C = x.shape[-2], x.shape[-1]
    n = int(np.prod(x.shape[:-2], dtype=np.int64)) if x.ndim > 2 else 1
    out = np.empty_like(x)
    fn = getattr(lib, f"forward_fill_{_suffix(x.dtype.type)}")
    fn(_ptr(x.reshape(n, L, C)), _ptr(out.reshape(n, L, C)),
       ctypes.c_int64(n), ctypes.c_int64(L), ctypes.c_int64(C),
       ctypes.c_int(n_threads or _default_threads()))
    return out


def linear_infill(t, x, n_threads=None):
    """NaN infill matching linear_interpolation_coeffs (no rectilinear)."""
    if _load() is None:
        from ..interpolation.linear import _fill_missing_linear
        import jax.numpy as jnp

        return np.asarray(_fill_missing_linear(jnp.asarray(t), jnp.asarray(x)))
    return _batched_call("linear_infill", t, x, n_threads=n_threads)


def natural_cubic_dense(t, x, n_threads=None):
    """Natural cubic coefficients for fully-observed data, packed like
    natural_cubic_coeffs: (..., L - 1, 4 * C)."""
    if _load() is None:
        from ..interpolation.cubic import natural_cubic_coeffs
        import jax.numpy as jnp

        return np.asarray(natural_cubic_coeffs(jnp.asarray(x), jnp.asarray(t)))
    return _batched_call(
        "natural_cubic_dense", t, x, out_last_dim_factor=4, out_rows_delta=-1,
        n_threads=n_threads,
    )


def natural_cubic_masked(t, x, n_threads=None):
    """NaN-masked natural cubic coefficients (the ``natural_cubic_coeffs``
    _version=1 semantics), packed (..., L - 1, 4 * C).  The host-side
    counterpart of the masked JAX pipeline, so NaN batches — the library's
    whole point (reference interpolation_cubic.py:78-167) — stay on the
    loader threads instead of serialising with device compute."""
    if _load() is None:
        from ..interpolation.cubic import natural_cubic_coeffs
        import jax.numpy as jnp

        return np.asarray(natural_cubic_coeffs(jnp.asarray(x), jnp.asarray(t)))
    return _batched_call(
        "natural_cubic_masked", t, x, out_last_dim_factor=4, out_rows_delta=-1,
        n_threads=n_threads,
    )


def hermite_coeffs(t, x, n_threads=None):
    """Hermite-with-backward-differences coefficients for fully-observed
    data, packed (..., L - 1, 4 * C)."""
    if _load() is None:
        from ..interpolation.hermite import (
            hermite_cubic_coefficients_with_backward_differences,
        )
        import jax.numpy as jnp

        return np.asarray(
            hermite_cubic_coefficients_with_backward_differences(
                jnp.asarray(x), jnp.asarray(t)
            )
        )
    return _batched_call(
        "hermite_coeffs", t, x, out_last_dim_factor=4, out_rows_delta=-1,
        n_threads=n_threads,
    )


def lyndon_words(channels, depth):
    lib = _load()
    if lib is None:
        from ..ops.logsignature import lyndon_words as jl

        return jl(channels, depth)
    fn = lib.lyndon_words_c
    fn.restype = ctypes.c_int64
    total = ctypes.c_int64(0)
    count = fn(ctypes.c_int32(channels), ctypes.c_int32(depth), None, None,
               ctypes.byref(total))
    letters = np.empty(total.value, dtype=np.int32)
    lengths = np.empty(count, dtype=np.int32)
    fn(ctypes.c_int32(channels), ctypes.c_int32(depth), _ptr(letters),
       _ptr(lengths), None)
    words = []
    pos = 0
    for n in lengths:
        words.append(tuple(int(v) for v in letters[pos : pos + n]))
        pos += n
    return tuple(words)


def logsig_window_values(x, boundaries, depth, n_threads=None):
    """Raw per-window logsignatures (Lyndon-word coordinates) of an infilled
    piecewise-linear path: the host twin of
    ``ops.logsignature.windowed_logsignatures``.

    x: (..., length, channels), NaN-free; boundaries: int (n_windows + 1,)
    indices into the length axis.  Returns (..., n_windows, n_logsig).
    """
    lib = _load()
    x = np.ascontiguousarray(x)
    b = np.ascontiguousarray(boundaries, dtype=np.int64)
    if lib is None:
        from ..ops.logsignature import windowed_logsignatures
        import jax.numpy as jnp

        return np.asarray(windowed_logsignatures(jnp.asarray(x), depth, b))
    L, C = x.shape[-2], x.shape[-1]
    n = int(np.prod(x.shape[:-2], dtype=np.int64)) if x.ndim > 2 else 1
    words = lyndon_words(C, int(depth))
    word_level = np.ascontiguousarray([len(w) for w in words], dtype=np.int32)
    flat = []
    for w in words:
        idx = 0
        for letter in w:
            idx = idx * C + letter
        flat.append(idx)
    word_flat = np.ascontiguousarray(flat, dtype=np.int32)
    n_logsig = len(words)
    n_windows = b.shape[0] - 1
    out = np.empty(x.shape[:-2] + (n_windows, n_logsig), dtype=x.dtype)
    fn = getattr(lib, f"logsig_windows_{_suffix(x.dtype.type)}")
    fn(_ptr(x.reshape(n, L, C)), _ptr(out.reshape(n, n_windows, n_logsig)),
       _ptr(b), ctypes.c_int64(n), ctypes.c_int64(L), ctypes.c_int64(C),
       ctypes.c_int32(int(depth)), ctypes.c_int64(n_windows),
       _ptr(word_level), _ptr(word_flat), ctypes.c_int64(n_logsig),
       ctypes.c_int(n_threads or _default_threads()))
    return out


def logsig_windows_host(t, x, depth, window_length, n_threads=None):
    """Host-side ``logsig_windows`` (the _version=1 semantics of
    torchcde_tpu.log_ode): window-grid merge, NaN-row insertion, linear
    infill, per-window logsignatures, X(t0) first row, cumulative sum —
    entirely on loader threads (NumPy + the C++ kernels, no JAX), so log-ODE
    preprocessing (the reference's signatory call, log_ode.py:57-67)
    overlaps device compute.
    """
    from ..log_ode import _merge_window_grid

    x = np.ascontiguousarray(x)
    t_np = np.asarray(t, dtype=np.float64)
    merged, boundaries, _new_t = _merge_window_grid(t_np, float(window_length))
    if merged.shape[0] != t_np.shape[0]:
        insert_mask = ~np.isin(merged, t_np)
        full = np.full(x.shape[:-2] + (merged.shape[0], x.shape[-1]), np.nan,
                       dtype=x.dtype)
        full[..., ~insert_mask, :] = x
        x = full
    if np.isnan(x).any():
        x = linear_infill(merged.astype(x.dtype), x, n_threads=n_threads)
    vals = logsig_window_values(x, boundaries, depth, n_threads=n_threads)
    C = x.shape[-1]
    first = np.zeros(x.shape[:-2] + (1, vals.shape[-1]), dtype=x.dtype)
    first[..., 0, :C] = x[..., 0, :]
    return np.cumsum(np.concatenate([first, vals], axis=-2), axis=-2)
