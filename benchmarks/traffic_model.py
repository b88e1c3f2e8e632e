"""Minimal-traffic and attainable-compute model for the flagship train step.

VERDICT round 3 asked for the floor, not just the achieved fraction: a kernel
reported at X% of an absolute peak says nothing about whether the remaining
(100-X)% is slack or structure.  This module states both floors for the fused
fixed-step Neural CDE train step (solvers/fused_pallas.py) so the benchmark
can report how close the implementation sits to what the WORKLOAD admits:

1. **Minimal HBM bytes per step** — bytes that must move between HBM and the
   chip no matter how the solve is scheduled: each coefficient slab read once
   per kernel (forward and backward), the O(n*H) knot residuals written once
   and read once (the backward's recompute anchors — the adjoint memory
   contract), the slab cotangents written once, and the requested output
   rows.  Everything else (stage activations, carried state, controller
   scalars) lives in VMEM by construction.

2. **Attainable MXU throughput** — the CDE vector field's matmuls are THIN:
   contraction dims K ∈ {H=8, CHp=24, W=128} against a 128x128 systolic
   array, so op i can use at most  util_i = min(M_i,128)/128 * min(K_i,128)/128
   of the array (idle rows/columns are workload structure, not scheduling
   slack).  The flops-weighted harmonic mean of those utilisations times the
   chip's nominal peak is the first-order attainable TFLOP/s for this op mix.
   (Pipelining across back-to-back ops can slightly EXCEED this first-order
   bound; N-drain effects push the other way.)

Run standalone for a report, or import ``flagship_model`` from bench.py.
"""

import numpy as np

_SLAB = 16  # fused-kernel coefficient slab rows (fused_pallas._SLAB)


def _util(m, k):
    return (min(m, 128) / 128.0) * (min(k, 128) / 128.0)


def flagship_model(batch, n_intervals, H, C, W, m_substeps=1, n_out=1,
                   ct_bytes=2, resid_bytes=4, stages=4):
    """Returns {min_bytes_per_step, attainable_frac, flops_per_step, ...} for
    the rk4 (``stages``-stage) fused train step at the given shapes.

    ct_bytes: coefficient-slab storage width (2 = bf16 mixed precision).
    resid_bytes: knot-residual storage width (f32: the backward recomputes
    stages from these states; see fused_pallas.py).
    """
    Hp = -(-H // 8) * 8
    CHp = -(-C * H // 8) * 8
    B = batch

    # --- 1. minimal HBM bytes per train step -----------------------------
    slab = n_intervals * _SLAB * B * ct_bytes          # one read, fwd
    resid_w = n_intervals * Hp * B * resid_bytes       # written by fwd
    out_rows = n_out * Hp * B * 4                      # requested knots (f32)
    fwd = slab + resid_w + out_rows
    bwd = (
        slab                                            # slabs re-read
        + resid_w                                       # residuals read
        + n_intervals * _SLAB * B * ct_bytes            # dct written
        + n_out * Hp * B * 4                            # gz read
    )
    glue = 2 * Hp * B * 4                               # z0 in, dz0 out
    min_bytes = fwd + bwd + glue

    # --- 2. attainable MXU fraction for the op mix -----------------------
    # Per-lane flops & utilisations.  Forward per stage: (W,H)@(H,.) then
    # (CHp,W)@(W,.).  Backward per interval: recompute the stages, then per
    # stage the four VJP dots dw2t/dh1/dw1t/dy (see _stage_backward).
    ops = []

    def add(mult, m, k):
        ops.append((mult * 2 * m * k, _util(m, k)))

    per_step_stages = stages * m_substeps
    add(per_step_stages, W, Hp)       # fwd: h1 = w1t @ y
    add(per_step_stages, CHp, W)      # fwd: g = w2t @ h1
    add(per_step_stages, W, Hp)       # bwd recompute h1
    add(per_step_stages, CHp, W)      # bwd recompute g
    add(per_step_stages, CHp, W)      # bwd: dw2t (M=CHp, K=tile -> full K)
    ops[-1] = (ops[-1][0], _util(CHp, 128))
    add(per_step_stages, W, CHp)      # bwd: dh1
    add(per_step_stages, W, Hp)       # bwd: dw1t (K=tile -> full K)
    ops[-1] = (ops[-1][0], _util(W, 128))
    add(per_step_stages, Hp, W)       # bwd: dy

    flops_lane_interval = sum(f for f, _ in ops)
    peak_equiv = sum(f / u for f, u in ops)
    attainable_frac = flops_lane_interval / peak_equiv
    flops_per_step = flops_lane_interval * n_intervals * B

    return {
        "min_bytes_per_step": int(min_bytes),
        "attainable_frac": attainable_frac,
        "flops_per_step": int(flops_per_step),
    }


def cubic_fit_model(batch, length, channels=1, wb=256, sb=128, sub=8,
                    phases=5, clock_ghz=0.94, cycles_per_substep=57.0):
    """Floor model for the VMEM-resident NaN-masked natural-cubic fit
    (ops/masked_cubic_resident.py) — round-4 VERDICT item 2.

    Two candidate floors; the larger binds:

    1. **5-pass HBM bytes**: the kernel reads the raw values once and writes
       the four coefficient arrays once (everything between is VMEM-resident)
       -> 5 * batch * length * channels * 4 bytes.

    2. **Serial scan chain**: the masked fills / gappy Thomas solve /
       re-basing are recurrences over the time axis.  Per batch tile the
       kernel runs ``phases`` dependent passes, each folding k rows in
       ``sub``-row slices with log-depth in-slice scans; tiles are
       grid-sequential on the single tensor core.  Chain length =
       tiles * phases * (k / sub) dependent sub-steps.  Measured on v5e
       (benchmarks/profile_resident.py + the sub-size sweep): ~57
       cycles/sub-step at sub=8, consistent with the ~25 two-vreg VPU ops
       each sub-step issues — and sub = 16/32/64 are measured REGRESSIONS
       (5.59/5.87/6.68 ms vs 4.93 ms: the fatter log-scans cost more issue
       cycles than the shorter fold chain saves), so the chain term is
       structure, not scheduling slack.
    """
    n = batch * channels
    k = -(-length // sb) * sb
    tiles = -(-n // wb)
    min_bytes = 5 * batch * length * channels * 4
    substeps = tiles * phases * (k // sub)
    latency_ms = substeps * cycles_per_substep / (clock_ghz * 1e9) * 1e3
    return {
        "min_bytes": int(min_bytes),
        "substeps": int(substeps),
        "latency_floor_ms": latency_ms,
        "hbm_floor_ms_at_peak": min_bytes / (819.0e9) * 1e3,
    }


def rev_heun_model(batch, n_intervals, H, C, W, m_substeps=1,
                   tile_fwd=4096, tile_bwd=2048, ct_bytes=2):
    """Floor model for the fused reversible-Heun train step
    (solvers/fused_pallas.py _rev_fwd_kernel/_rev_bwd_kernel) — round-4
    VERDICT item 2 for BASELINE config 5 (batch 16k).

    1. **Minimal HBM bytes**: forward reads each coefficient slab once and
       writes the (y, yhat) knot pair (the reversible adjoint's O(1)-memory
       contract: states are reconstructed, not stored per stage); backward
       re-reads slabs + (y, yhat), writes dct; plus output/cotangent rows.

    2. **Attainable MXU fraction**: same thin-K structure as the flagship
       (contractions K in {H, CHp, W} against the 128-wide array), with
       reversible Heun's op mix: 1 new stage eval per forward interval, and
       per backward interval the inverse-map reconstruction (2 stage evals)
       + the two carried cotangents' VJP dots.

    3. **Serial grid chain**: grid steps = (batch/tile_fwd) * n forward +
       (batch/tile_bwd) * n backward, each a dependent Mosaic grid
       iteration (carried (y, yhat) / adjoint state).
    """
    Hp = -(-H // 8) * 8
    CHp = -(-C * H // 8) * 8
    B = batch

    slab = n_intervals * _SLAB * B * ct_bytes
    knots = 2 * n_intervals * Hp * B * 4          # (y, yhat) written by fwd
    fwd = slab + knots + 2 * Hp * B * 4           # + z0 in, zT out
    bwd = slab + knots + n_intervals * _SLAB * B * ct_bytes + 2 * Hp * B * 4
    min_bytes = fwd + bwd

    ops = []

    def add(mult, m, k):
        ops.append((mult * 2 * m * k, _util(m, k)))

    # Forward: dX/dt is DISCONTINUOUS at knots, so fhat cannot be carried
    # across an interval boundary — every interval re-evaluates the stage at
    # its local fraction 0 plus one per substep: (m+1) evals per interval is
    # workload structure, not implementation slack.
    per_iv = m_substeps
    add(per_iv + 1, W, Hp)        # fwd: stage h1 (m substeps + knot re-eval)
    add(per_iv + 1, CHp, W)       # fwd: stage g
    add(2 * per_iv, W, Hp)        # bwd: reconstruct both stage h1's
    add(2 * per_iv, CHp, W)       # bwd: reconstruct both stage g's
    add(per_iv, CHp, W)           # bwd: dw2t (K=tile -> full K)
    ops[-1] = (ops[-1][0], _util(CHp, 128))
    add(per_iv, W, CHp)           # bwd: dh1
    add(per_iv, W, Hp)            # bwd: dw1t (K=tile -> full K)
    ops[-1] = (ops[-1][0], _util(W, 128))
    add(2 * per_iv, Hp, W)        # bwd: dy for both carried cotangents

    flops_lane_iv = sum(f for f, _ in ops)
    peak_equiv = sum(f / u for f, u in ops)
    attainable_frac = flops_lane_iv / peak_equiv
    flops_per_step = flops_lane_iv * n_intervals * B

    grid_steps = (-(-B // tile_fwd) + -(-B // tile_bwd)) * n_intervals
    return {
        "min_bytes_per_step": int(min_bytes),
        "attainable_frac": attainable_frac,
        "flops_per_step": int(flops_per_step),
        "grid_steps": int(grid_steps),
    }


def report(peak_tflops=197.0, peak_gbps=819.0, measured_ms=None,
           measured_tflops=None, measured_gbps=None):
    m = flagship_model(batch=4096, n_intervals=99, H=8, C=3, W=128)
    att_tf = peak_tflops * m["attainable_frac"]
    lines = [
        "flagship fused rk4 train step, batch 4096 x 99 intervals "
        "(H=8, C=3, W=128, bf16 slabs):",
        f"  minimal HBM traffic: {m['min_bytes_per_step'] / 1e6:.1f} MB/step "
        f"-> {m['min_bytes_per_step'] / 1e9 / (peak_gbps / 1e3) * 1e3:.0f} us "
        "at HBM peak",
        f"  MXU work: {m['flops_per_step'] / 1e9:.1f} GFLOP/step at "
        f"attainable {100 * m['attainable_frac']:.1f}% of peak "
        f"(thin K in {{8,24,128}}) -> {att_tf:.1f} TFLOP/s attainable, "
        f"{m['flops_per_step'] / (att_tf * 1e12) * 1e3:.2f} ms compute floor",
    ]
    if measured_ms is not None:
        floor_ms = m["flops_per_step"] / (att_tf * 1e12) * 1e3
        lines.append(
            f"  measured: {measured_ms:.3f} ms/step = "
            f"{measured_ms / floor_ms:.2f}x the attainable-compute floor"
            + (f", {measured_tflops:.1f} TFLOP/s "
               f"({100 * measured_tflops / att_tf:.0f}% of attainable)"
               if measured_tflops else "")
        )
        if measured_gbps is not None:
            meas_bytes = measured_gbps * 1e9 * measured_ms / 1e3
            lines.append(
                f"  HBM: measured {meas_bytes / 1e6:.0f} MB/step vs minimal "
                f"{m['min_bytes_per_step'] / 1e6:.1f} MB "
                f"(measured/minimal = "
                f"{meas_bytes / m['min_bytes_per_step']:.2f}); "
                "the step is compute-bound, not HBM-bound")
    return "\n".join(lines)


if __name__ == "__main__":
    print(report(measured_ms=1.702, measured_tflops=31.2,
                 measured_gbps=105.8))
