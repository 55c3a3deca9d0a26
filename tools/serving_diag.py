"""Diagnose the 64-channel serving spread (VERDICT r4 #5).

r4 published a 19x spread (199.7 / 1105.7 / 3856.7 audio-s/s over 3
windows) for the batched serving metric. Two hypotheses:

  (a) relay/window drift — the whole chip-visible throughput moved
      between windows (CLAUDE.md: 2-3x on ~10-min timescales, and the
      pure-copy floor itself swung 95-152 us);
  (b) engine bimodality — a recompile or dispatch-path flip at batch=64
      makes the engine itself alternate between fast and slow programs.

Method: interleave the serving measurement with a fixed-cost SENTINEL
(a jitted bf16 matmul chain with no data dependence on the engine) in
every window. If serving/sentinel stays stable while both swing, the
spread is drift (a); if serving swings against a steady sentinel, it is
the engine (b).

Usage: python tools/serving_diag.py [--windows 5]
Writes bench_results/serving_diag.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

import bench  # noqa: E402


def sentinel_runner():
    """Fixed-cost probe: 200 chained 2048x2048 bf16 matmuls (~3.4 GFLOP
    each => ~9 ms of device work per chain at the measured 200 TF/s peak
    — comfortably above the >=50 ms span rule when timed with 8 chains)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2048, 2048)),
                    jnp.bfloat16)

    @partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(i, x):
            return (x @ x) * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, iters, body, x)

    float(jnp.sum(run(x, 1).astype(jnp.float32)[:1, :1]))   # compile
    float(jnp.sum(run(x, 400).astype(jnp.float32)[:1, :1]))

    def timed():
        from opencl_fft_tpu.utils.profiling import median_chain_delta
        def chain(k):
            t0 = time.time()
            float(jnp.sum(run(x, k).astype(jnp.float32)[:1, :1]))
            return time.time() - t0
        dt, _ = median_chain_delta(chain, 399, 1e-6, min_chain_s=0.05)
        return dt          # seconds per matmul iter (or None)

    return timed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    sent = sentinel_runner()
    rows = []
    for w in range(args.windows):
        row = {"window": w}
        s0 = sent()
        row["sentinel_us_pre"] = None if s0 is None else round(s0 * 1e6, 2)
        try:
            row["serving"] = round(bench.bench_batched_serving(
                batch=args.batch), 1)
        except bench.Unmeasurable as e:
            row["serving"] = None
            row["serving_error"] = str(e)
        s1 = sent()
        row["sentinel_us_post"] = None if s1 is None else round(s1 * 1e6, 2)
        if row["serving"] and s0 and s1:
            # serving throughput normalized by the window's sentinel
            # speed: stable ratio => drift; swinging ratio => engine
            row["serving_x_sentinel_us"] = round(
                row["serving"] * (s0 + s1) / 2 * 1e6, 1)
        print(f"  window {w}: {row}", file=sys.stderr, flush=True)
        rows.append(row)

    servings = [r["serving"] for r in rows if r.get("serving")]
    ratios = [r["serving_x_sentinel_us"] for r in rows
              if r.get("serving_x_sentinel_us")]
    def spread(v):
        return round(max(v) / min(v), 2) if len(v) >= 2 else None
    out = {
        "windows": rows,
        "serving_spread": spread(servings),
        "normalized_spread": spread(ratios),
        "verdict": (
            None if not ratios or len(servings) < 2 else
            "drift" if spread(ratios) and spread(servings)
            and spread(ratios) < 0.5 * spread(servings) else
            "engine-or-mixed"),
    }
    path = os.path.join(ROOT, "bench_results", "serving_diag.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("serving_spread", "normalized_spread", "verdict")}))
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
