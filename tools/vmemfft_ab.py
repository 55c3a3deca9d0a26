"""Interleaved on-chip A/B: VMEM-resident Pallas FFT vs the XLA mm path.

For each size, times the batched forward transform at the bench sweep's
operating point (~32MB split working set) for every requested variant —
``mm`` (four-step matmul), ``l2_tb<k>`` (two-level kernel), ``l3_tb<k>``
(three-level kernel) — round-robin so every variant sees the same
relay-drift window; min over rounds with a physical HBM floor. Merges
results into ``bench_results/vmemfft_ab.json`` (the artifact behind
``fft._VMEM_AUTO_SIZES`` and ``vmemfft._LEVELS``).

    python tools/vmemfft_ab.py --sizes 10,12 --rounds 4
    python tools/vmemfft_ab.py --sizes 16 --variants mm,l3_tb8,l3_tb16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from opencl_fft_tpu.ops import fft as F
from opencl_fft_tpu.ops.pallas import vmemfft

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "bench_results", "vmemfft_ab.json")


def default_variants(logn: int):
    v = ["mm"]
    n = 1 << logn
    if n in vmemfft._PLANS2:
        tb = vmemfft._PLANS2[n][2]
        v += [f"l2_tb{tb}"]
        if 2 * tb * n * 8 * 6 <= 96 << 20:     # ~6x-canvas VMEM chain
            v += [f"l2_tb{2 * tb}"]
    if n in vmemfft._PLANS:
        tb = vmemfft._PLANS[n][3]
        v += [f"l3_tb{tb}"]
    if n in vmemfft._PLANS3H:
        tb = vmemfft._PLANS3H[n][3]
        v += [f"h3_tb{tb}"]
    if n in vmemfft._PLANS_SL:
        tb = vmemfft._PLANS_SL[n][2]
        v += [f"sl_tb{tb}", f"slx_tb{tb}"]
    return v


def make_runner(logn: int, variant: str, iters: int):
    n = 1 << logn
    batch = max(1, (32 << 20) // (8 * n))
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / np.sqrt(n)

    # Both arms get the normalization the way production (bench_fft_sweep
    # -> fft_split(..., scale=)) applies it: mm fuses the trailing
    # multiply into its last matmul/transpose; the vmem kernel applies it
    # in its epilogue. Scaling OUTSIDE the pallas_call (the pre-r3 form
    # of this tool) charged the kernel one full extra HBM read+write pass
    # per iteration that production never pays (~110 us at 2^20).
    if variant == "mm":
        def one(x):
            return F.fft_split(x, -1, "mm", scale=scale)
    else:
        levels = (4 if variant.startswith("h3")
                  else 5 if variant.startswith("t3")   # transposed-L2 3-level
                  else 6 if variant.startswith("g3")   # + Gauss leaves
                  else 7 if variant.startswith("n3")   # lean (no concats)
                  else 8 if variant.startswith("f2")   # front-2 hybrid
                  else 9 if variant.startswith("sl")   # sublane-DFT 2-level
                  else int(variant[1]))
        # l2x / slx = XLA-transpose out (kernel emits the freq-major canvas)
        rowmajor = not (variant.startswith("l2x")
                        or variant.startswith("slx"))
        parts = variant.split("_")
        tb = int(parts[1][2:])                     # _tb<k> (unused for f2)
        plan = None                                # _p<f1>x<f2>x<f3> override
        mask = 7 if levels != 8 else None          # _m<mask> gauss levels
        for p in parts[2:]:
            if p.startswith("p"):
                plan = tuple(int(f) for f in p[1:].split("x")) + (tb,)
            elif p.startswith("m"):
                mask = int(p[1:])

        def one(x):
            return vmemfft.fft_vmem(x, -1, tb_override=tb, levels=levels,
                                    rowmajor_out=rowmajor, scale=scale,
                                    plan_override=plan, gauss_mask=mask)

    @partial(jax.jit, static_argnums=1)
    def run(x, k):
        return jax.lax.fori_loop(0, k, lambda i, x: one(x), x)

    def sync(o):
        return float(jnp.sum(o[0][..., :1]))

    t0 = time.time()
    sync(run((re, im), 1))
    compile_s = time.time() - t0
    sync(run((re, im), iters))

    def timed(k):
        t0 = time.time(); sync(run((re, im), k)); return time.time() - t0

    return timed, batch, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10,11,12,13,14",
                    help="comma-separated log2 sizes")
    ap.add_argument("--variants", default="",
                    help="override variant list (comma-separated)")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    for logn in [int(s) for s in args.sizes.split(",")]:
        n = 1 << logn
        # Chains must carry >= ~50 ms of device work: the per-round
        # delta divides host-clock jitter (relay sync noise, ~ms) by
        # iters, and the old 50/25-iter chains at 2^16-2^20 (6-19 ms)
        # made in-window rankings mush (same fix as bench_fft_sweep).
        iters = 200
        variants = (args.variants.split(",") if args.variants
                    else default_variants(logn))
        runners = {}
        for v in variants:
            try:
                runners[v] = make_runner(logn, v, iters)
            except Exception as e:
                print(f"2^{logn} {v}: SKIP ({str(e)[:100]})",
                      file=sys.stderr, flush=True)
        if not runners:
            continue
        best = {v: float("inf") for v in runners}
        wins = {v: 0 for v in runners}
        floor = runners[next(iter(runners))][1] * n * 8 * 2 / 3e12
        for r in range(args.rounds):
            rnd = {}
            for v, (timed, batch, _) in runners.items():
                dt = (min(timed(iters) for _ in range(2))
                      - min(timed(1) for _ in range(2))) / (iters - 1)
                if dt > floor:
                    best[v] = min(best[v], dt)
                    rnd[v] = dt
            if rnd:
                wins[min(rnd, key=rnd.get)] += 1
        batch = runners[next(iter(runners))][1]
        row = {}
        for v in runners:
            if not np.isfinite(best[v]):
                print(f"2^{logn} {v}: UNMEASURABLE", file=sys.stderr,
                      flush=True)
                continue
            gf = 5 * n * logn * batch / best[v] / 1e9
            row[f"{v}_us"] = round(best[v] * 1e6, 1)
            row[f"{v}_gflops"] = round(gf)
            print(f"2^{logn} {v}: {best[v]*1e6:9.1f} us {gf:8.1f} GFLOP/s "
                  f"(won {wins[v]}/{args.rounds} rounds, compile "
                  f"{runners[v][2]:.0f}s)", file=sys.stderr, flush=True)
        if row:
            finite = {v: t for v, t in best.items() if np.isfinite(t)}
            row["winner"] = min(finite, key=finite.get)
            row["round_wins"] = {v: wins[v] for v in finite}
            results[f"2^{logn}"] = row
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"merged -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
