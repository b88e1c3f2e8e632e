"""Input pipeline: coefficient dataloading with native host preprocessing.

The reference's suggested workflow is "preprocess offline, save coefficients,
treat them as the dataset, feed through DataLoader"
(interpolation_cubic.py:216-228).  This module is the runtime version of that
pattern for accelerators: minibatch coefficient construction runs on the host
CPU in background threads — using the multithreaded C++ kernels in
``torchcde_tpu.native`` when built, NumPy/JAX otherwise — and finished batches
are prefetched to the device, overlapping preprocessing with TPU compute.

    loader = CoefficientDataLoader(x, y, batch_size=256,
                                   interpolation="hermite", prefetch=2)
    for coeffs, labels in loader:          # device-resident arrays
        params, opt_state, loss = train_step(params, opt_state, coeffs, labels)
"""

import queue
import threading

import jax
import numpy as np

from . import native


def _hermite_host(t, x):
    return native.hermite_coeffs(t, x)


def _natural_cubic_host(t, x):
    if np.isnan(x).any():
        # NaN paths go through the (batched, masked) JAX kernel; the dense
        # native kernel covers the common fully-observed case.
        import jax.numpy as jnp

        from .interpolation.cubic import natural_cubic_coeffs

        return np.asarray(natural_cubic_coeffs(jnp.asarray(x), jnp.asarray(t)))
    return native.natural_cubic_dense(t, x)


def _linear_host(t, x):
    if np.isnan(x).any():
        return native.linear_infill(t, x)
    return x


_PREPROCESSORS = {
    "hermite": _hermite_host,
    "cubic": _natural_cubic_host,
    "linear": _linear_host,
}


class CoefficientDataLoader:
    """Iterates (coefficients, labels) minibatches with prefetching.

    Arguments:
        x: (N, length, channels) raw observations (NaNs = missing); NumPy.
        y: (N, ...) labels; NumPy.
        batch_size: minibatch size (last partial batch is dropped).
        interpolation: "hermite" | "cubic" | "linear" — which coefficient
            construction to run per batch.
        t: optional 1-D times (defaults to 0..length-1).
        shuffle: reshuffle each epoch.
        seed: shuffle seed.
        prefetch: number of batches prepared ahead (background thread).
        device_put: move finished batches to the default device.
    """

    def __init__(self, x, y, batch_size, interpolation="hermite", t=None,
                 shuffle=True, seed=0, prefetch=2, device_put=True):
        if interpolation not in _PREPROCESSORS:
            raise ValueError(
                f"Unknown interpolation {interpolation!r}; expected one of "
                f"{sorted(_PREPROCESSORS)}"
            )
        self._x = np.asarray(x)
        self._y = np.asarray(y)
        if self._x.shape[0] != self._y.shape[0]:
            raise ValueError(
                f"x and y disagree on the number of samples: "
                f"{self._x.shape[0]} vs {self._y.shape[0]}"
            )
        self._fn = _PREPROCESSORS[interpolation]
        self._t = (
            np.asarray(t, dtype=self._x.dtype)
            if t is not None
            else np.arange(self._x.shape[-2], dtype=self._x.dtype)
        )
        if self._t.shape != (self._x.shape[-2],):
            raise ValueError(
                f"t must be 1-D with length {self._x.shape[-2]}; got shape "
                f"{self._t.shape}"
            )
        self._batch_size = int(batch_size)
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._prefetch = max(1, int(prefetch))
        self._device_put = device_put

    def __len__(self):
        return self._x.shape[0] // self._batch_size

    def __iter__(self):
        order = (
            self._rng.permutation(self._x.shape[0])
            if self._shuffle
            else np.arange(self._x.shape[0])
        )
        n_batches = len(self)
        q = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()

        def worker():
            try:
                for i in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[i * self._batch_size : (i + 1) * self._batch_size]
                    coeffs = self._fn(self._t, self._x[idx])
                    labels = self._y[idx]
                    if self._device_put:
                        coeffs = jax.device_put(coeffs)
                        labels = jax.device_put(labels)
                    q.put((coeffs, labels))
                q.put(None)
            except BaseException as e:  # surface worker failures to the consumer
                q.put(e)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
