"""Interleaved on-chip A/B of FFT structural variants (relay-drift safe).

Times the batched forward mm-FFT at the bench sweep's operating points
with a module flag toggled per variant, round-robin so every variant sees
the same drift window; min over rounds. Used to validate structural
changes (e.g. the transposed-output second leaf) before baking them in.

    python tools/fft_ab.py [--rounds 4]
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

SIZES = [14, 16, 18, 20]


def make_runner(logn: int, out_t: bool, iters: int):
    n = 1 << logn
    batch = max(1, (32 << 20) // (8 * n))
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / np.sqrt(n)

    old = F._OUT_T_MIN_N2
    F._OUT_T_MIN_N2 = 64 if out_t else (1 << 30)
    try:
        @partial(jax.jit, static_argnums=1)
        def run(x, k):
            def body(i, x):
                r, i_ = F._fft_mm(x, -1)
                return r * scale, i_ * scale
            return jax.lax.fori_loop(0, k, body, x)

        def sync(o):
            return float(jnp.sum(o[0][..., :1]))

        sync(run((re, im), 1))                  # trace+compile with flag set
        sync(run((re, im), iters))
    finally:
        F._OUT_T_MIN_N2 = old                   # never leak the variant flag

    def timed(k):
        t0 = time.time(); sync(run((re, im), k)); return time.time() - t0

    return timed, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    for logn in SIZES:
        n = 1 << logn
        iters = 200 if logn <= 14 else 50
        runners = {v: make_runner(logn, v, iters) for v in (False, True)}
        best = {v: float("inf") for v in runners}
        for _ in range(args.rounds):
            for v, (timed, batch) in runners.items():
                dt = (min(timed(iters) for _ in range(2))
                      - min(timed(1) for _ in range(2))) / (iters - 1)
                if dt > batch * n * 8 * 2 / 3e12:
                    best[v] = min(best[v], dt)
        batch = runners[True][1]
        for v in (False, True):
            if not np.isfinite(best[v]):
                print(f"2^{logn} out_t={v}: UNMEASURABLE (no delta cleared "
                      f"the physical floor)", file=sys.stderr, flush=True)
                continue
            gf = 5 * n * logn * batch / best[v] / 1e9
            print(f"2^{logn} out_t={v}: {best[v]*1e6:9.1f} us "
                  f"{gf:8.1f} GFLOP/s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
