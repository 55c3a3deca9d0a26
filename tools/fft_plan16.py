"""Interleaved on-chip A/B of 2^16 factorization-tree candidates.

The 2^16 sweep point is the weakest FFT size: the tuned outer split
(n1=128) recurses its n2=512 factor through PLANS[512]=8, and that inner
8x64 tree routes through the swapaxes path (8 < _AXIS2_MIN_N1), paying
transpose passes that the flop count hides. This tool times the full
production path (fft_split impl="mm", fused 1/sqrt(N) scale — exactly
what bench.py's sweep runs) with the candidate trees patched into
_SPLIT_OVERRIDES at trace time, round-robin across candidates so every
one sees the same relay-drift window; min over rounds.

    python tools/fft_plan16.py [--rounds 4] [--logn 16]
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

# candidate -> (override patch, out_t flag). Factor-sum in brackets is
# the per-point leaf-MAC weight (n1+n2 summed down the tree) — the MXU
# flop proxy; passes is the rough HBM-sweep count.
CANDIDATES = {
    # status quo: 128 x (8 x 64)            [200], transposes in the 8-leaf
    "cur":     ({}, False),
    # 128 x dense-512                       [640], 2 passes, flop-heavy
    "i512d":   ({512: 0}, False),
    # 128 x (64 x 8): axis-2 64-leaf first  [200], trailing 8-leaf
    "i512_64": ({512: 64}, False),
    # 256 x 256 both dense                  [512], 2 passes + final T
    "b256":    ({65536: 256, 256: 0}, False),
    # 256 x 256 dense, final T fused into the second leaf matmul
    "b256t":   ({65536: 256, 256: 0}, True),
    # dense-512 x 128                       [640], axis-2 512-leaf first
    "o512":    ({65536: 512, 512: 0}, False),
}


def make_runner(logn: int, patch: dict, out_t: bool, iters: int):
    n = 1 << logn
    batch = max(1, (32 << 20) // (8 * n))
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / np.sqrt(n)

    saved = {k: F._SPLIT_OVERRIDES.get(k) for k in patch}
    old_t = F._OUT_T_MIN_N2
    F._SPLIT_OVERRIDES.update(patch)
    F._OUT_T_MIN_N2 = 64 if out_t else (1 << 30)
    try:
        @partial(jax.jit, static_argnums=1)
        def run(x, k):
            def body(i, x):
                return F.fft_split(x, -1, "mm", scale=scale)
            return jax.lax.fori_loop(0, k, body, x)

        def sync(o):
            return float(jnp.sum(o[0][..., :1]))

        sync(run((re, im), 1))              # trace+compile with patch set
        sync(run((re, im), iters))
    finally:
        F._OUT_T_MIN_N2 = old_t
        for k, v in saved.items():
            if v is None:
                F._SPLIT_OVERRIDES.pop(k, None)
            else:
                F._SPLIT_OVERRIDES[k] = v

    def timed(k):
        t0 = time.time(); sync(run((re, im), k)); return time.time() - t0

    return timed, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--logn", type=int, default=16)
    args = ap.parse_args()

    logn = args.logn
    n = 1 << logn
    iters = 200 if logn <= 14 else 50
    runners = {}
    for name, (patch, out_t) in CANDIDATES.items():
        print(f"compiling {name} ...", file=sys.stderr, flush=True)
        runners[name] = make_runner(logn, patch, out_t, iters)

    best = {v: float("inf") for v in runners}
    wins = {v: 0 for v in runners}
    for r in range(args.rounds):
        rnd = {}
        for v, (timed, batch) in runners.items():
            dt = (min(timed(iters) for _ in range(2))
                  - min(timed(1) for _ in range(2))) / (iters - 1)
            if dt > batch * n * 8 * 2 / 3e12:
                rnd[v] = dt
                best[v] = min(best[v], dt)
        if rnd:
            w = min(rnd, key=rnd.get)
            wins[w] += 1
            print(f"round {r}: " + "  ".join(
                f"{v}={rnd[v]*1e6:.1f}us" for v in rnd) + f"  -> {w}",
                file=sys.stderr, flush=True)

    batch = next(iter(runners.values()))[1]
    print("--- best (min over rounds) ---", file=sys.stderr)
    for v in runners:
        if not np.isfinite(best[v]):
            print(f"{v:8s}: UNMEASURABLE", file=sys.stderr)
            continue
        gf = 5 * n * logn * batch / best[v] / 1e9
        print(f"{v:8s}: {best[v]*1e6:9.1f} us {gf:8.1f} GFLOP/s "
              f"wins={wins[v]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
