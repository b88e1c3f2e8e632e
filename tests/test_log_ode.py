"""Log-ODE / logsignature tests.

Ports the contract of /root/reference/test/test_log_ode.py (windowed
logsignatures recoverable from the transform's increments) with the oracle
role of signatory played by brute-force Chen products in NumPy, plus analytic
anchors: channel counts (3 -> 3/6/14 at depth 1/2/3), depth-1 = increments,
and the Lévy-area coefficient of a two-segment path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import torchcde_tpu
from torchcde_tpu.ops.logsignature import (
    logsignature_channels,
    lyndon_words,
    path_logsignature,
    windowed_logsignatures,
)

rng = np.random.default_rng(7)


def _sig_oracle(path, depth):
    """Brute-force signature via sequential Chen products (NumPy)."""

    def exp_np(v):
        lv = [v]
        p = v
        f = 1.0
        for k in range(2, depth + 1):
            p = np.kron(p, v)
            f *= k
            lv.append(p / f)
        return lv

    def chen_np(A, B):
        out = []
        for k in range(1, depth + 1):
            term = A[k - 1] + B[k - 1]
            for i in range(1, k):
                term = term + np.kron(A[i - 1], B[k - i - 1])
            out.append(term)
        return out

    sig = None
    for i in range(path.shape[0] - 1):
        e = exp_np(path[i + 1] - path[i])
        sig = e if sig is None else chen_np(sig, e)
    return sig


def _logsig_oracle(path, depth):
    sig = _sig_oracle(path, depth)
    c = path.shape[-1]
    # log(1+s) truncated
    acc = [s.copy() for s in sig]
    power = sig

    def mul(s, t):
        out = []
        for k in range(1, depth + 1):
            term = np.zeros(c**k)
            for i in range(1, k):
                term = term + np.kron(s[i - 1], t[k - i - 1])
            out.append(term)
        return out

    for m in range(2, depth + 1):
        power = mul(power, sig)
        coef = ((-1.0) ** (m + 1)) / m
        acc = [x + coef * p for x, p in zip(acc, power)]
    # gather Lyndon words
    out = []
    for word in lyndon_words(c, depth):
        idx = 0
        for letter in word:
            idx = idx * c + letter
        out.append(acc[len(word) - 1][idx])
    return np.asarray(out)


def test_channel_counts():
    # Anchors from reference example/logsignature_example.py:75-78.
    assert [logsignature_channels(3, d) for d in (1, 2, 3)] == [3, 6, 14]
    assert [logsignature_channels(2, d) for d in (1, 2, 3)] == [2, 3, 5]
    assert logsignature_channels(4, 3) == 4 + 6 + 20


def test_levy_area():
    # Increments e1 then e2: depth-2 logsig = [1, 1, 1/2] in (0),(1),(01).
    p = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    ls = np.asarray(path_logsignature(p, 2))
    assert np.allclose(ls, [1.0, 1.0, 0.5])


@pytest.mark.parametrize("depth", [1, 2, 3, 4, 5])
def test_logsignature_vs_oracle(depth):
    for _ in range(3):
        length = int(rng.integers(3, 12))
        c = int(rng.integers(2, 4))
        path = rng.standard_normal((length, c))
        ours = np.asarray(path_logsignature(jnp.asarray(path), depth))
        oracle = _logsig_oracle(path, depth)
        assert np.allclose(ours, oracle, atol=1e-10), (depth, length, c)


def test_windowed_matches_slices():
    path = rng.standard_normal((2, 3, 15, 3))
    boundaries = jnp.asarray([0, 5, 9, 14])
    wl = np.asarray(windowed_logsignatures(jnp.asarray(path), 3, boundaries))
    for wi, (a, b) in enumerate(zip([0, 5, 9], [5, 9, 14])):
        direct = np.asarray(path_logsignature(jnp.asarray(path[..., a : b + 1, :]), 3))
        assert np.allclose(wl[..., wi, :], direct, atol=1e-10)


def test_logsig_windows_transform():
    # The increments of the transformed path are the per-window
    # logsignatures, with X(t0) folded into the first row (the contract
    # verified against signatory in reference test_log_ode.py:8-33).
    x = rng.standard_normal((4, 50, 3))
    depth = 3
    window = 10.0
    out = np.asarray(torchcde_tpu.logsig_windows(jnp.asarray(x), depth, window))
    n_windows = 5
    assert out.shape == (4, n_windows + 1, logsignature_channels(3, depth))
    incs = np.diff(out, axis=-2)
    for wi in range(n_windows):
        a, b = 10 * wi, 10 * (wi + 1)
        direct = np.asarray(path_logsignature(jnp.asarray(x[:, a : b + 1]), depth))
        assert np.allclose(incs[:, wi], direct, atol=1e-8)
    # First row: X(t0) padded into logsig channels (log_ode.py:53-55).
    assert np.allclose(out[:, 0, :3], x[:, 0])
    assert np.allclose(out[:, 0, 3:], 0)


def test_logsignature_windows_v0_rescaling():
    x = rng.standard_normal((2, 21, 2))
    out_v0, new_t = torchcde_tpu.logsignature_windows(jnp.asarray(x), 2, 5.0)
    out_v1 = torchcde_tpu.logsig_windows(jnp.asarray(x), 2, 5.0)
    assert np.asarray(new_t).shape == (5,)
    incs0 = np.diff(np.asarray(out_v0), axis=-2)
    incs1 = np.diff(np.asarray(out_v1), axis=-2)
    widths = np.diff(np.asarray(new_t))
    assert np.allclose(incs0, incs1 * widths[:, None], atol=1e-8)


def test_logsig_windows_with_nans_and_custom_t():
    # Missing values + window boundaries that don't align with the data grid.
    x = rng.standard_normal((3, 30, 2))
    x[rng.random(x.shape) < 0.2] = np.nan
    t = np.sort(rng.random(30)) * 13
    t += 0.01 * np.arange(30)
    out = torchcde_tpu.logsig_windows(jnp.asarray(x), 2, 3.0, jnp.asarray(t))
    assert np.isfinite(np.asarray(out)).all()


def test_windowed_skewed_falls_back_and_matches():
    # Clustered boundaries make nw*maxw >> n: the padded-block reduction must
    # fall back to the prefix-scan path, with identical results either way.
    path = rng.standard_normal((2, 61, 3))
    skewed = jnp.asarray([0, 1, 2, 3, 60])  # one giant window among tiny ones
    wl = np.asarray(windowed_logsignatures(jnp.asarray(path), 2, skewed))
    for wi, (a, b) in enumerate(zip([0, 1, 2, 3], [1, 2, 3, 60])):
        direct = np.asarray(path_logsignature(jnp.asarray(path[:, a : b + 1]), 2))
        assert np.allclose(wl[:, wi], direct, atol=1e-10)
