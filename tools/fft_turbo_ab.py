"""Interleaved on-chip A/B of the "turbo" (pure-bf16 leaf) FFT tier vs
the default auto policy (bf16x3 leaves + measured kernel routing).

Reports both the speedup and the measured relative error of each arm
against numpy (the trade the tier sells). Round-robin in one window,
fixed 200-iteration chains, physical HBM floors; min over rounds.
Writes bench_results/fft_turbo_ab.json.

    python tools/fft_turbo_ab.py [--rounds 3] [--sizes 14,16,18,20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from opencl_fft_tpu.ops import fft as F

VARIANTS = ("auto", "turbo")


def make_runner(logn: int, mode: str, iters: int):
    n = 1 << logn
    batch = max(1, (32 << 20) // (8 * n))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    re = jnp.asarray(x.real, jnp.float32)
    im = jnp.asarray(x.imag, jnp.float32)
    scale = 1.0 / np.sqrt(n)

    F.set_fast_math("turbo" if mode == "turbo" else None)
    try:
        @partial(jax.jit, static_argnums=1)
        def run(z, k):
            def body(i, z):
                r, i_ = F.fft_split(z, -1, "auto")
                return r * scale, i_ * scale
            return jax.lax.fori_loop(0, k, body, z)

        def sync(o):
            return float(jnp.sum(o[0][..., :1]))

        # one-shot accuracy of this arm (forward, relative to numpy)
        fr, fi = run((re, im), 1)
        got = (np.asarray(fr) + 1j * np.asarray(fi)) / scale
        ref = np.fft.fft(x)
        rel = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        sync(run((re, im), iters))
    finally:
        F.set_fast_math(None)               # never leak the mode

    def timed(k):
        t0 = time.time(); sync(run((re, im), k)); return time.time() - t0

    return timed, batch, rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sizes", default="14,16,18,20")
    ap.add_argument("--out", default="bench_results/fft_turbo_ab.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    results = {"_comment": ("pure-bf16 'turbo' leaves vs the default auto "
                            "policy, interleaved rounds with HBM floors; "
                            "rel_err columns show the accuracy trade (numpy "
                            "oracle). In-window speedup is the signal.")}
    for logn in sizes:
        n = 1 << logn
        iters = 200
        runners = {v: make_runner(logn, v, iters) for v in VARIANTS}
        best = {v: float("inf") for v in VARIANTS}
        wins = {v: 0 for v in VARIANTS}
        for _ in range(args.rounds):
            rnd = {}
            for v, (timed, batch, _rel) in runners.items():
                dt = (min(timed(iters) for _ in range(2))
                      - min(timed(1) for _ in range(2))) / (iters - 1)
                if dt > batch * n * 8 * 2 / 3e12:
                    best[v] = min(best[v], dt)
                    rnd[v] = dt
            if rnd:
                wins[min(rnd, key=rnd.get)] += 1
        batch = runners["auto"][1]
        row = {"round_wins": wins}
        for v in VARIANTS:
            row[f"{v}_rel_err"] = float(f"{runners[v][2]:.2e}")
            if not np.isfinite(best[v]):
                print(f"2^{logn} {v}: UNMEASURABLE", file=sys.stderr,
                      flush=True)
                continue
            gf = 5 * n * logn * batch / best[v] / 1e9
            row[f"{v}_us"] = round(best[v] * 1e6, 1)
            row[f"{v}_gflops"] = round(gf, 1)
            print(f"2^{logn} {v:5s}: {best[v]*1e6:9.1f} us {gf:8.1f} GFLOP/s"
                  f"  rel_err {runners[v][2]:.1e}", file=sys.stderr,
                  flush=True)
        if all(np.isfinite(best[v]) for v in VARIANTS):
            row["turbo_speedup"] = round(best["auto"] / best["turbo"], 3)
        results[f"2^{logn}"] = row

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
