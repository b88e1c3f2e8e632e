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
    if np.isnan(x).any():
        # The reference Hermite path builds on linearly-infilled data
        # (interpolation_hermite_cubic_bdiff.py:33); infill on the host too.
        x = native.linear_infill(t, x)
    return native.hermite_coeffs(t, x)


def _natural_cubic_host(t, x):
    if np.isnan(x).any():
        # Masked C++ kernel: NaN batches stay on the loader threads instead
        # of serialising preprocessing with device compute.
        return native.natural_cubic_masked(t, x)
    return native.natural_cubic_dense(t, x)


def _linear_host(t, x):
    if np.isnan(x).any():
        return native.linear_infill(t, x)
    return x


_PREPROCESSORS = {
    "hermite": _hermite_host,
    "cubic": _natural_cubic_host,
    "linear": _linear_host,
    # "logsig": built per-loader (needs depth / window_length), see __init__.
}


class CoefficientDataLoader:
    """Iterates (coefficients, labels) minibatches with prefetching.

    Arguments:
        x: (N, length, channels) raw observations (NaNs = missing); NumPy.
        y: (N, ...) labels; NumPy.
        batch_size: minibatch size.
        interpolation: "hermite" | "cubic" | "linear" — which coefficient
            construction to run per batch.
        t: optional 1-D times (defaults to 0..length-1).
        shuffle: reshuffle each epoch.
        seed: shuffle seed.
        prefetch: number of batches prepared ahead of the consumer.
        device_put: move finished batches to the default device.
        num_workers: preprocessing threads.  More than one pays off when the
            native C++ kernels are built (ctypes releases the GIL during the
            call); pure-NumPy preprocessing mostly serialises on the GIL.
            Batches are always yielded in order regardless of worker count.
        drop_last: when True (the DEFAULT), the final PARTIAL batch is
            **silently dropped** — every yielded batch has exactly
            ``batch_size`` rows, so jitted train steps never retrace.  Set
            False to also get the ragged tail batch (its different shape
            triggers one extra XLA compile for jitted consumers).
    """

    def __init__(self, x, y, batch_size, interpolation="hermite", t=None,
                 shuffle=True, seed=0, prefetch=2, device_put=True,
                 num_workers=1, drop_last=True, depth=None, window_length=None):
        if interpolation == "logsig":
            # Log-ODE preprocessing (the reference's signatory dependency,
            # log_ode.py:57-67) on loader threads: yields the windowed
            # logsignature PATH values — exactly torchcde_tpu.logsig_windows
            # — which are themselves the linear-interpolation coefficients
            # for the Neural RDE workflow.
            if depth is None or window_length is None:
                raise ValueError(
                    "interpolation='logsig' needs depth= and window_length=")
            d, wl = int(depth), float(window_length)
            self._fn = lambda t_, x_: native.logsig_windows_host(t_, x_, d, wl)
        elif interpolation not in _PREPROCESSORS:
            raise ValueError(
                f"Unknown interpolation {interpolation!r}; expected one of "
                f"{sorted(_PREPROCESSORS) + ['logsig']}"
            )
        else:
            self._fn = _PREPROCESSORS[interpolation]
        self._x = np.asarray(x)
        self._y = np.asarray(y)
        if self._x.shape[0] != self._y.shape[0]:
            raise ValueError(
                f"x and y disagree on the number of samples: "
                f"{self._x.shape[0]} vs {self._y.shape[0]}"
            )
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
        self._num_workers = max(1, int(num_workers))
        self._drop_last = bool(drop_last)

    def __len__(self):
        n, bs = self._x.shape[0], self._batch_size
        return n // bs if self._drop_last else -(-n // bs)

    def _make_batch(self, idx):
        coeffs = self._fn(self._t, self._x[idx])
        labels = self._y[idx]
        if self._device_put:
            coeffs = jax.device_put(coeffs)
            labels = jax.device_put(labels)
        return coeffs, labels

    def __iter__(self):
        order = (
            self._rng.permutation(self._x.shape[0])
            if self._shuffle
            else np.arange(self._x.shape[0])
        )
        n_batches = len(self)
        stop = threading.Event()
        # In-flight bound: workers may run at most prefetch + num_workers
        # batches ahead of the consumer.
        slots = threading.Semaphore(self._prefetch + self._num_workers - 1)
        next_task = iter(range(n_batches))
        task_lock = threading.Lock()
        cond = threading.Condition()
        results = {}

        def worker():
            while not stop.is_set():
                slots.acquire()
                with task_lock:
                    i = next(next_task, None)
                if i is None:
                    slots.release()
                    return
                idx = order[i * self._batch_size : (i + 1) * self._batch_size]
                try:
                    item = self._make_batch(idx)
                except BaseException as e:  # surfaced to the consumer, in order
                    item = e
                with cond:
                    results[i] = item
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self._num_workers)
        ]
        for th in threads:
            th.start()
        try:
            for i in range(n_batches):
                with cond:
                    while i not in results:
                        cond.wait()
                    item = results.pop(i)
                slots.release()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
