"""Where does cubic_fit's time go?  (round-4 VERDICT missing #4 / weak #2)

Decomposes the 8192x4096x1 NaN-masked natural-cubic fit benchmark:
  - full ``natural_cubic_coeffs`` (what bench_cubic_fit times)
  - the resident Pallas kernel alone (is there XLA glue around it?)
  - wb=128 vs wb=256 batch tiles (serial-chain length halves with 2x tiles)
  - k and batch slopes (latency chain vs bandwidth split)

Run on TPU: python benchmarks/profile_resident.py
"""

import sys

import numpy as np

sys.path.insert(0, "benchmarks")
from run_benchmarks import _chained_time  # noqa: E402


def main():
    import jax.numpy as jnp

    import torchcde_tpu as tc
    from torchcde_tpu.ops.masked_cubic_resident import (
        masked_natural_cubic_resident,
    )

    rng = np.random.default_rng(0)

    def make(batch, length):
        x = rng.standard_normal((batch, length, 1)).astype(np.float32)
        x[rng.random(x.shape) < 0.2] = np.nan
        return jnp.asarray(x)

    def timed(tag, op, x, reps=4):
        t = _chained_time(op, x, reps=reps, unroll=True)
        byt = 5 * x.nbytes  # 5-pass floor: read once, write 4 coeff arrays
        print(f"{tag}: {1e3 * t:8.3f} ms   5-pass floor bw "
              f"{byt / t / 1e9:7.1f} GB/s")
        return t

    B, K = 8192, 4096
    x_full = make(B, K)
    t_grid = jnp.arange(K, dtype=jnp.float32)

    t_all = timed("full natural_cubic_coeffs   8192x4096",
                  tc.natural_cubic_coeffs, x_full)
    t_res = timed("resident kernel alone       8192x4096",
                  lambda v: jnp.concatenate(
                      masked_natural_cubic_resident(t_grid, v[..., 0], 1),
                      axis=-1),
                  x_full)
    t_128 = timed("resident kernel wb=128      8192x4096",
                  lambda v: jnp.concatenate(
                      masked_natural_cubic_resident(t_grid, v[..., 0], 1,
                                                    wb=128),
                      axis=-1),
                  x_full)
    print(f"XLA glue around the kernel: {1e3 * (t_all - t_res):.3f} ms")
    print(f"wb 256 vs 128 ratio: {t_128 / t_res:.2f}x")

    # Slopes: halve k (chain length per tile halves, tiles unchanged at
    # wb=256 -> if latency-bound in the row chain, time ~ halves;
    # bytes also halve, so this alone cannot split -- add the batch slope:
    # halving batch halves TILES (chain) and bytes equally too.  The
    # discriminator is wb: 128->256 doubles bytes-per-tile but halves tiles,
    # so a pure-bandwidth kernel is flat while a per-row-latency kernel
    # stays flat too... the real split comes from the absolute numbers vs
    # the 5-pass floor at peak (819 GB/s).
    x_half_k = make(B, K // 2)
    th_grid = jnp.arange(K // 2, dtype=jnp.float32)
    timed("resident kernel             8192x2048",
          lambda v: jnp.concatenate(
              masked_natural_cubic_resident(th_grid, v[..., 0], 1), axis=-1),
          x_half_k)
    x_half_b = make(B // 2, K)
    timed("resident kernel             4096x4096",
          lambda v: jnp.concatenate(
              masked_natural_cubic_resident(t_grid, v[..., 0], 1), axis=-1),
          x_half_b)


if __name__ == "__main__":
    main()
