"""Logsignatures of piecewise-linear paths, TPU-native.

Replaces the external C++/CUDA ``signatory`` package consumed by the
reference's log-ODE transform (/root/reference/torchcde/log_ode.py:53-59,
``signatory.logsignature_channels`` and ``signatory.Logsignature``).

Design: work in the truncated tensor algebra T^{<=d}(R^c), representing a
group element by its levels (flattened arrays (..., c^k), k = 1..d).

* the signature of one linear segment with increment v is exp(v) =
  (v, v^{(2)}/2!, ..., v^{(d)}/d!);
* segment signatures combine by Chen's identity — an *associative* product —
  so prefix signatures of the whole path are one ``lax.associative_scan``
  (O(log n) depth, fully batched: ideal for TPU, where the reference's
  per-window Python loop at log_ode.py:57-67 is serial);
* the signature of any window [a, b] is then P_a^{-1} x P_b using the
  truncated group inverse (geometric series);
* log is the truncated series log(1 + s) = sum (-1)^{m+1} s^m / m;
* coordinates are reported on Lyndon *words* (signatory's default
  ``mode="words"``): the tensor-log coefficients gathered at Lyndon-word
  indices.  Channel counts therefore match signatory exactly: 3 input
  channels -> 3/6/14 at depth 1/2/3
  (/root/reference/example/logsignature_example.py:75-78).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Lyndon words (host-side, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def lyndon_words(channels: int, depth: int):
    """All Lyndon words over {0..channels-1} of length 1..depth, by (length,
    lexicographic) order — Duval's generation algorithm."""
    words = []
    w = [-1]
    while w:
        w[-1] += 1
        m = len(w)
        if w[-1] < channels:
            words.append(tuple(w))
            while len(w) < depth:
                w.append(w[-m])
        else:
            w.pop()
            continue
        while w and w[-1] == channels - 1:
            w.pop()
    words.sort(key=lambda word: (len(word), word))
    return tuple(words)


@functools.lru_cache(maxsize=None)
def logsignature_channels(channels: int, depth: int) -> int:
    """Dimension of the depth-d logsignature (number of Lyndon words);
    signatory.logsignature_channels equivalent (log_ode.py:53)."""
    return len(lyndon_words(channels, depth))


@functools.lru_cache(maxsize=None)
def _lyndon_indices(channels: int, depth: int):
    """Flat tensor-algebra index of each Lyndon word, grouped by length."""
    by_len = {k: [] for k in range(1, depth + 1)}
    for word in lyndon_words(channels, depth):
        idx = 0
        for letter in word:
            idx = idx * channels + letter
        by_len[len(word)].append(idx)
    return {k: np.asarray(v, dtype=np.int32) for k, v in by_len.items()}


# ---------------------------------------------------------------------------
# Truncated tensor algebra (levels are flattened arrays (..., c^k))
# ---------------------------------------------------------------------------


def _outer(a, b, c_a, c_b):
    return (a[..., :, None] * b[..., None, :]).reshape(a.shape[:-1] + (c_a * c_b,))


def tensor_exp(v, depth):
    """exp of a level-1 element: the signature of one linear segment."""
    c = v.shape[-1]
    levels = [v]
    power = v
    fact = 1.0
    for k in range(2, depth + 1):
        power = _outer(power, v, c ** (k - 1), c)
        fact *= k
        levels.append(power / fact)
    return tuple(levels)


def chen_product(A, B):
    """Chen's identity: the group product in T^{<=d} (implicit unit level 0)."""
    depth = len(A)
    c = A[0].shape[-1]
    out = []
    for k in range(1, depth + 1):
        term = A[k - 1] + B[k - 1]
        for i in range(1, k):
            term = term + _outer(A[i - 1], B[k - i - 1], c**i, c ** (k - i))
        out.append(term)
    return tuple(out)


def _mul_no_unit(s, t):
    """(s * t)_k for non-unital elements (level-0 coefficient zero)."""
    depth = len(s)
    c = s[0].shape[-1]
    out = []
    for k in range(1, depth + 1):
        term = None
        for i in range(1, k):
            prod = _outer(s[i - 1], t[k - i - 1], c**i, c ** (k - i))
            term = prod if term is None else term + prod
        if term is None:
            term = jnp.zeros_like(s[k - 1])
        out.append(term)
    return tuple(out)


def group_inverse(A):
    """(1 + s)^{-1} = 1 - s + s^2 - ... truncated at depth."""
    depth = len(A)
    acc = tuple(-a for a in A)
    power = A
    sign = 1.0
    for _m in range(2, depth + 1):
        power = _mul_no_unit(power, A)
        acc = tuple(x + sign * p for x, p in zip(acc, power))
        sign = -sign
    return acc


def tensor_log(A):
    """log(1 + s) = s - s^2/2 + s^3/3 - ... truncated at depth."""
    depth = len(A)
    acc = tuple(jnp.array(a) for a in A)
    power = A
    for m in range(2, depth + 1):
        power = _mul_no_unit(power, A)
        coef = ((-1.0) ** (m + 1)) / m
        acc = tuple(x + coef * p for x, p in zip(acc, power))
    return acc


def lyndon_coordinates(log_levels):
    """Gather tensor-log coefficients at Lyndon-word indices (signatory's
    default ``mode="words"`` basis), concatenated by word length."""
    depth = len(log_levels)
    c = log_levels[0].shape[-1]
    idx = _lyndon_indices(c, depth)
    parts = []
    for k in range(1, depth + 1):
        if idx[k].size:
            parts.append(jnp.take(log_levels[k - 1], jnp.asarray(idx[k]), axis=-1))
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Path signatures
# ---------------------------------------------------------------------------


def prefix_signatures(increments, depth):
    """Prefix signatures P_i = exp(dx_1) x ... x exp(dx_i) along axis -2.

    increments: (..., n, c).  Returns levels ((..., n, c^k)) — one associative
    scan over segments.
    """
    segs = tensor_exp(increments, depth)
    return jax.lax.associative_scan(chen_product, segs, axis=-2)


def chen_reduce(levels):
    """Ordered Chen product along axis -2 by pairwise tree reduction.

    Unlike ``prefix_signatures`` this computes only the *total* product —
    halving the data each pass, so total work is ~2x one pass instead of
    log2(n) full passes.  The all-zero element is the group unit, so padded
    (zero-increment) segments are no-ops.
    """
    m = levels[0].shape[-2]
    while m > 1:
        half = m // 2
        evens = tuple(lvl[..., 0 : 2 * half : 2, :] for lvl in levels)
        odds = tuple(lvl[..., 1 : 2 * half : 2, :] for lvl in levels)
        combined = chen_product(evens, odds)
        if m % 2:
            combined = tuple(
                jnp.concatenate([c, lvl[..., -1:, :]], axis=-2)
                for c, lvl in zip(combined, levels)
            )
        levels = combined
        m = half + (m % 2)
    return tuple(lvl[..., 0, :] for lvl in levels)


def path_signature(path, depth):
    """Signature of a piecewise-linear path (..., length, c) over its whole
    span — the batched equivalent of signatory.Signature."""
    increments = path[..., 1:, :] - path[..., :-1, :]
    prefixes = prefix_signatures(increments, depth)
    return tuple(level[..., -1, :] for level in prefixes)


def path_logsignature(path, depth, mode="words"):
    """Logsignature of a piecewise-linear path (..., length, c): the batched
    equivalent of signatory.Logsignature(depth) (log_ode.py:57-59)."""
    sig = path_signature(path, depth)
    log_levels = tensor_log(sig)
    if mode == "tensor":
        return log_levels
    elif mode == "words":
        return lyndon_coordinates(log_levels)
    raise ValueError(f"Unknown logsignature mode {mode!r}")


def windowed_logsignatures(path, depth, boundaries):
    """Logsignatures of windows [boundaries[i], boundaries[i+1]] of a
    piecewise-linear path, all at once.

    path: (..., length, c); boundaries: int array (n_windows + 1,) of indices
    into the length axis.  Returns (..., n_windows, logsig_channels).

    With concrete boundaries (the offline-preprocessing case) each window's
    segments are gathered into a (n_windows, max_window) block — padded with
    zero increments, whose segment signature is the group unit — and reduced
    by ``chen_reduce``: ~2 passes over the data, replacing the reference's
    per-window signatory calls (log_ode.py:57-67).  Traced boundaries fall
    back to one prefix scan + two gathers: window sig = P_a^{-1} x P_b.
    """
    increments = path[..., 1:, :] - path[..., :-1, :]
    n = increments.shape[-2]
    c = path.shape[-1]

    b_np = None
    if not isinstance(boundaries, jax.core.Tracer):
        b_np = np.asarray(boundaries).astype(np.int64)

    if b_np is not None:
        lens = b_np[1:] - b_np[:-1]
        nw = len(lens)
        maxw = int(lens.max()) if nw else 0
        # Skewed windows pad every window to the largest: cap the blowup (a
        # clustered irregular grid could make nw*maxw >> n) and use the
        # prefix-scan formulation instead.
        if nw == 0 or maxw * nw > 4 * n:
            b_np = None

    if b_np is not None:
        batch_shape = increments.shape[:-2]
        uniform = maxw * nw == n and int(lens.min()) == maxw and b_np[0] == 0
        if uniform:
            # Uniform contiguous windows: a free reshape instead of a gather.
            blocks = increments.reshape(batch_shape + (nw, maxw, c))
        else:
            idx = b_np[:-1, None] + np.arange(maxw)[None, :]
            valid = idx < b_np[1:, None]
            blocks = jnp.take(
                increments, jnp.asarray(np.clip(idx, 0, n - 1).reshape(-1)), axis=-2
            ).reshape(batch_shape + (nw, maxw, c))
            blocks = blocks * jnp.asarray(valid, dtype=path.dtype)[..., None]
        window_sigs = chen_reduce(tensor_exp(blocks, depth))
        return lyndon_coordinates(tensor_log(window_sigs))

    boundaries = jnp.asarray(boundaries)
    prefixes = prefix_signatures(increments, depth)
    # P_0 = identity (zero levels); prefix index i corresponds to segments
    # 1..i, i.e. grid position i.
    padded = tuple(
        jnp.concatenate([jnp.zeros_like(lvl[..., :1, :]), lvl], axis=-2)
        for lvl in prefixes
    )
    starts = tuple(jnp.take(lvl, boundaries[:-1], axis=-2) for lvl in padded)
    ends = tuple(jnp.take(lvl, boundaries[1:], axis=-2) for lvl in padded)
    window_sigs = chen_product(group_inverse(starts), ends)
    return lyndon_coordinates(tensor_log(window_sigs))
