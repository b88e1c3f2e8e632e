"""Roofline accounting for the benchmark harness.

Every benchmark number in this repo is also reported against the chip's
ceilings: achieved TFLOP/s and GB/s, the fraction of peak each represents,
and which bound (MXU flops, HBM bandwidth, or dispatch/latency) the kernel
sits against.  FLOP and byte counts come from XLA's own cost model
(``compiled.cost_analysis()``), which for Pallas kernels uses the
``pl.CostEstimate`` each kernel declares — so the denominators track the code
instead of hand-maintained constants.

The reference (torchcde) publishes no performance numbers at all (SURVEY.md
section 6), so these reports ARE the record; they must carry denominators to
be falsifiable.
"""

import jax

# Peak single-chip numbers (dense bf16 matmul TFLOP/s and HBM GB/s) from
# Google's published TPU system specifications.  Matched by device_kind
# prefix; report ``chip: unknown`` rather than guessing when unmatched.
PEAKS = {
    "TPU v5 lite": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},  # v5e
    "TPU v5e": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},
    "TPU v5p": {"tflops_bf16": 459.0, "hbm_gbps": 2765.0},
    "TPU v5": {"tflops_bf16": 459.0, "hbm_gbps": 2765.0},
    "TPU v4": {"tflops_bf16": 275.0, "hbm_gbps": 1228.0},
    "TPU v6 lite": {"tflops_bf16": 918.0, "hbm_gbps": 1640.0},  # v6e/Trillium
}


def chip_kind():
    try:
        return jax.devices()[0].device_kind
    except RuntimeError:  # pragma: no cover
        return "unknown"


def _peak_for(kind):
    for prefix, peaks in PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return None


def cost_of(jitted, *args, **kwargs):
    """XLA cost analysis {flops, bytes} of ``jitted(*args)`` or None."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_accessed = float(ca.get("bytes accessed", 0.0))
        if flops <= 0.0 and bytes_accessed <= 0.0:
            return None
        return {"flops": flops, "bytes": bytes_accessed}
    except Exception:
        return None


def annotate(result, t_seconds, cost, per_iter=1, attainable_tflops=None):
    """Adds {chip, tflops, gbps, pct_peak_mxu, pct_peak_hbm, bound} to a
    benchmark ``result`` dict in place (and returns it).

    ``cost`` is a dict from ``cost_of`` covering ``per_iter`` timed
    iterations; ``t_seconds`` is the per-iteration time.
    ``attainable_tflops``: a workload-structure compute ceiling from an
    analytic model (benchmarks/traffic_model.py) — thin-operand matmuls
    cannot use the full 128x128 MXU, so the honest question is distance to
    the ATTAINABLE rate, not the nominal peak.
    """
    kind = chip_kind()
    result["chip"] = kind
    if cost is None or t_seconds <= 0:
        return result
    flops = cost["flops"] / per_iter
    bytes_accessed = cost["bytes"] / per_iter
    tflops = flops / t_seconds / 1e12
    gbps = bytes_accessed / t_seconds / 1e9
    result["tflops"] = round(tflops, 3)
    result["gbps"] = round(gbps, 2)
    peaks = _peak_for(kind)
    if peaks is None:
        return result
    mxu_frac = tflops / peaks["tflops_bf16"]
    hbm_frac = gbps / peaks["hbm_gbps"]
    result["pct_peak_mxu"] = round(100 * mxu_frac, 2)
    if hbm_frac <= 1.0:
        result["pct_peak_hbm"] = round(100 * hbm_frac, 2)
    else:
        # Fusion-boundary bytes over HBM peak are NOT an achieved HBM
        # fraction — keep the impossible number out of pct_peak_hbm and
        # report it as what it is: an upper bound on HBM pressure.
        result["fusion_bytes_pct_of_hbm_peak_upper_bound"] = round(
            100 * hbm_frac, 2)
    if attainable_tflops:
        result["attainable_tflops"] = round(attainable_tflops, 1)
        result["pct_attainable_mxu"] = round(100 * tflops / attainable_tflops, 1)
    # Label the binding constraint.  A ceiling is only claimed when the
    # kernel is actually NEAR it (>= 40% — round 3 labelled an 8%-of-MXU
    # config "mxu", which was a misnomer); kernels near their analytic
    # attainable-compute ceiling are labelled so even when the nominal-peak
    # fraction is small (idle MXU rows/columns under thin operands are
    # workload structure, not slack).  Far from every ceiling = the serial /
    # dispatch-latency regime the fused kernels exist to escape.  The byte
    # counts are XLA fusion-boundary bytes: when the implied bandwidth
    # exceeds the HBM peak, the steady-state working set is VMEM-resident
    # across the timed scan's iterations and the traffic never reaches HBM —
    # report that regime explicitly instead of an impossible HBM fraction.
    if hbm_frac > 1.0:
        result["bound"] = "vmem-resident"
        result["note"] = (
            "fusion-boundary bytes/time exceeds HBM peak: working set stays "
            "in VMEM across scan iterations; pct_peak_hbm is an upper bound "
            "on HBM pressure, not achieved DRAM bandwidth")
    elif attainable_tflops and tflops >= 0.7 * attainable_tflops:
        result["bound"] = "mxu-attainable"
        result["note"] = (
            "at the thin-operand compute floor: contraction dims well below "
            "the 128-wide MXU cap the usable fraction of the array; see "
            "benchmarks/traffic_model.py for the bound")
    elif max(mxu_frac, hbm_frac) < 0.40:
        result["bound"] = "latency"
    elif mxu_frac >= hbm_frac:
        result["bound"] = "mxu"
    else:
        result["bound"] = "hbm"
    return result
