"""Per-size structural-floor accounting for the batched FFT sweep.

BASELINE.md derives honest HBM floors for 2^18/2^20 by hand; this tool
extends the same arithmetic to EVERY sweep size so "is size X done?"
has an answer (VERDICT r3 #6). Three bounds per size, floor = max:

  hbm1     2 * ws / BW — any implementation must read and write the
           ~32 MB split-complex working set at least once (BW = the
           measured 600 GB/s roofline). A naive per-dot pass count is
           NOT a valid bound below 2^18: XLA's tiling fuses the 2-level
           tree's two contractions over different axes into ~one
           effective pass (measured 2^14: 164 us vs a naive 6-dot
           "floor" of 671 — the intermediate tiles stay resident).
  hbm3     3 * hbm1, applied only at 2^18/2^20 where >= 3 passes are
           structurally FORCED: a 2-level tree needs dense >= 1024-pt
           leaves, compute-infeasible inside the 1.5e-5 error budget
           (BASELINE.md's argument), so at least 3 contraction levels
           over different axes must round-trip HBM.
  comp61   traced MXU FLOPs of the shipped plan / 61 TFLOP/s — the
           fastest precision-budget-compliant engine rate measured on
           this chip (bf16x3 / Precision.HIGH; pure-bf16 at 200 TF is
           outside the 1.5e-5 budget). FLOPs are summed over the
           jaxpr's dot_generals (2*M*N*K each), so this is the floor of
           the SHIPPED factorization, not of all conceivable plans.

Counting is backend-independent (jaxpr structure), so this runs on CPU;
measured medians come from bench_details.json. Output: a markdown table
for BASELINE.md.

    python tools/fft_floor.py [--details bench_details.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

BW = 679e9          # de-noised HBM roofline (bench_results/hbm_probe.json, r5)
TF_BUDGET = 61e12   # bf16x3 measured rate — fastest within error budget
FORCED_3PASS = {18, 20}


def trace_dots(logn: int):
    """(ws_bytes, dot_count, total_dot_flops) of the bench computation."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops.fft import fft_split

    n = 1 << logn
    batch = max(1, (32 << 20) // (8 * n))
    ws = batch * n * 8                       # split-complex f32 re+im
    re = jnp.zeros((batch, n), jnp.float32)
    im = jnp.zeros((batch, n), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda x: fft_split(x, -1, "mm", scale=1.0 / np.sqrt(n)))((re, im))

    dots, flops = 0, 0

    def walk(jx):
        nonlocal dots, flops
        for eqn in jx.eqns:
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):      # closed jaxpr params
                    walk(v.jaxpr)
            if eqn.primitive.name == "dot_general":
                dots += 1
                d = eqn.params["dimension_numbers"]
                (lc, _rc), (lb, _rb) = d
                lhs = eqn.invars[0].aval.shape
                rhs = eqn.invars[1].aval.shape
                out = eqn.outvars[0].aval.shape
                k = int(np.prod([lhs[a] for a in lc]))
                flops += 2 * int(np.prod(out)) * k
    walk(jaxpr.jaxpr)
    return ws, dots, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--details", default="bench_details.json")
    args = ap.parse_args()
    try:
        details = json.load(open(args.details)).get("fft_sweep", {})
    except (OSError, json.JSONDecodeError):
        details = {}

    print("| size | batch | plan GFLOP | hbm1 us | hbm3 us | comp61 us "
          "| floor us | measured us | floor/meas |")
    print("|---|---|---|---|---|---|---|---|---|")
    for logn in (10, 12, 14, 16, 18, 20):
        n = 1 << logn
        batch = max(1, (32 << 20) // (8 * n))
        ws, dots, flops = trace_dots(logn)
        hbm1 = 2 * ws / BW * 1e6
        hbm3 = 3 * hbm1 if logn in FORCED_3PASS else None
        comp = flops / TF_BUDGET * 1e6
        floor = max(hbm1, hbm3 or 0.0, comp)
        row = details.get(f"2^{logn}", {})
        meas = row.get("us")
        eff = f"{floor / meas:.0%}" if meas else "—"
        print(f"| 2^{logn} | {batch} | {flops/1e9:.1f} | {hbm1:.0f} "
              f"| {f'{hbm3:.0f}' if hbm3 else '—'} | {comp:.0f} "
              f"| {floor:.0f} | {meas if meas is not None else '—'} "
              f"| {eff} |")


if __name__ == "__main__":
    main()
