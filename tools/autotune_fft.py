"""Autotune the four-step FFT factorization per (size, batch-bucket).

Greedy bottom-up: for each power-of-two size, measure every candidate left
factor n1 (and a direct dense leaf for n <= 512) with the smaller sizes
already fixed to their tuned best, then bake the winners into
``opencl_fft_tpu/ops/_fft_plans.py``. Two operating points are tuned
separately (they want different plans — VERDICT r1 weak #6):

  * large — ~32 MB working sets (the batched-throughput benches);
  * small — batch=2 (the streaming convolver's per-block transforms).

Measurements run on whatever chip is visible (run this on the target
TPU); timing uses on-device fori_loop chains to mask the relay's ~30 ms
host-sync latency, with min-over-tries and non-positive-delta rejection.

Run:  python tools/autotune_fft.py [--iters 20] [--bucket large|small|both]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from opencl_fft_tpu.ops import fft as F


def make_timer(n: int, batch: int, iters: int):
    """Compile a fori-chain runner for the CURRENT plan tables; returns
    timed(k) -> wall seconds. Compilation happens here, ONCE, so that all
    candidates can then be timed round-robin inside the same drift
    window (the r2 table was tuned candidate-by-candidate sequentially,
    and windows drifting 2-3x between candidates picked plans that left
    2-3x on the table — bench_results/fft_plan_sweep.json)."""
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / np.sqrt(n)

    def step(x):
        r, i = F._fft_mm(x, -1)
        return r * scale, i * scale

    @partial(jax.jit, static_argnums=1)
    def run(x, k):
        return jax.lax.fori_loop(0, k, lambda j, x: step(x), x)

    def sync(o):
        return float(jnp.sum(o[0][..., :1]))

    sync(run((re, im), 1))
    sync(run((re, im), iters))

    def timed(k):
        t0 = time.time()
        sync(run((re, im), k))
        return time.time() - t0

    return timed


def measure_interleaved(timers: dict, iters: int, floor_s: float,
                        rounds: int = 3) -> dict:
    """{cand: us} — min over round-robin rounds, floor-guarded."""
    best = {c: float("inf") for c in timers}
    for _ in range(rounds):
        for c, timed in timers.items():
            dt = (min(timed(iters) for _ in range(2))
                  - min(timed(1) for _ in range(2))) / (iters - 1)
            if dt > floor_s:
                best[c] = min(best[c], dt)
    return {c: t * 1e6 for c, t in best.items()}


def candidates(n: int):
    """Candidate left factors for n (0 = direct dense leaf)."""
    k = int(np.log2(n))
    cands = set()
    if n <= F._MAX_DIRECT:
        cands.add(0)
    for n1 in (16, 32, 64, 128, 256, 512, 1024):
        if n1 < n and n % n1 == 0 and n // n1 >= 2:
            cands.add(n1)
            cands.add(n // n1)
    cands.add(1 << (k // 2))                     # balanced
    return sorted(c for c in cands if c == 0 or (2 <= c < n))


def tune_bucket(bucket: str, iters: int, max_log2: int) -> dict:
    """Greedy bottom-up tuning of one bucket; returns {n: n1}."""
    table = {}
    if bucket == "large":
        sizes = range(8, max_log2 + 1)
        live = F._SPLIT_OVERRIDES

        def batch_for(n):
            return max(1, (32 << 20) // (8 * n))
    else:
        sizes = range(6, min(max_log2, 14) + 1)
        live = F._SPLIT_OVERRIDES_SMALL

        def batch_for(n):
            return 2

    for k in sizes:
        n = 1 << k
        batch = batch_for(n)
        it = iters if bucket == "large" else max(iters, 200)
        # compile ALL candidates first, then time them round-robin so every
        # candidate shares the same relay-drift window
        timers = {}
        for n1 in candidates(n):
            live.clear()
            live.update(table)
            live[n] = n1
            try:
                timers[n1] = make_timer(n, batch, it)
            except Exception as e:                  # oversize leaf etc.
                print(f"  [{bucket}] n=2^{k} n1={n1}: FAILED {str(e)[:60]}",
                      file=sys.stderr, flush=True)
        if not timers:
            continue
        floor = batch * n * 8 * 2 / 3e12
        times = measure_interleaved(timers, it, floor)
        for n1, t in sorted(times.items(), key=lambda kv: kv[1]):
            if not np.isfinite(t):
                print(f"  [{bucket}] n=2^{k} n1={n1}: unmeasurable",
                      file=sys.stderr, flush=True)
                continue
            gf = 5 * n * k * batch / t / 1e3
            print(f"  [{bucket}] n=2^{k} n1={n1 or 'direct':>6}: {t:9.1f} us "
                  f"{gf:8.1f} GFLOP/s", file=sys.stderr, flush=True)
        finite = {c: t for c, t in times.items() if np.isfinite(t)}
        if not finite:
            print(f"[{bucket}] n=2^{k}: all candidates unmeasurable, "
                  f"keeping default", file=sys.stderr, flush=True)
            continue
        best = min(finite, key=finite.get)
        table[n] = best
        print(f"[{bucket}] n=2^{k}: best n1={best} ({finite[best]:.1f} us)",
              file=sys.stderr, flush=True)
    live.clear()
    live.update(table)
    return table


def write_plans(large: dict, small: dict) -> None:
    out = "opencl_fft_tpu/ops/_fft_plans.py"
    with open(out, "w") as f:
        f.write('"""Tuned four-step split tables (generated by '
                'tools/autotune_fft.py on the\ntarget chip — see that file '
                'for methodology). n -> left factor n1; 0 means\na direct '
                'dense leaf. PLANS is tuned at ~32 MB working sets, '
                'PLANS_SMALL at\nbatch=2 (streaming-convolver shapes)."""\n')
        for name, tbl in (("PLANS", large), ("PLANS_SMALL", small)):
            f.write(f"\n{name} = {{\n")
            for n in sorted(tbl):
                f.write(f"    {n}: {tbl[n]},\n")
            f.write("}\n")
    print(f"wrote {out}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-log2", type=int, default=20)
    ap.add_argument("--bucket", choices=["large", "small", "both"],
                    default="both")
    args = ap.parse_args()

    large = dict(F._SPLIT_OVERRIDES)
    small = dict(F._SPLIT_OVERRIDES_SMALL)
    if args.bucket in ("large", "both"):
        large = tune_bucket("large", args.iters, args.max_log2)
    if args.bucket in ("small", "both"):
        small = tune_bucket("small", args.iters, args.max_log2)
    write_plans(large, small)


if __name__ == "__main__":
    main()
