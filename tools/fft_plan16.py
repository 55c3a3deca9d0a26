"""Interleaved on-chip A/B of four-step factorization-tree candidates.

The tuned outer splits recurse their inner factors through the same
PLANS table that was tuned for STANDALONE transforms — e.g. at 2^16 the
n2=512 factor goes through PLANS[512]=8, and that inner 8x64 tree routes
through the swapaxes path (8 < _AXIS2_MIN_N1), paying transpose passes
the flop count hides. This tool times the full production path
(fft_split impl="mm", fused 1/sqrt(N) scale — exactly what bench.py's
sweep runs) with candidate trees patched into _SPLIT_OVERRIDES at trace
time, round-robin across candidates so every one sees the same
relay-drift window; min over rounds.

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


# Curated zero-transpose flat-chain plans (_fft_mm_flat) per log2(n):
# every factor a dense leaf, minor factor biased to 128 lanes. Each also
# gets a Gauss-leaf variant (suffix g).
_FLAT_CANDS = {
    10: [(32, 32), (8, 128)],
    11: [(16, 128), (32, 64)],
    12: [(32, 128), (64, 64)],
    14: [(128, 128), (16, 8, 128)],
    16: [(64, 32, 32), (32, 32, 64), (256, 256), (16, 32, 128)],
    17: [(64, 64, 32), (32, 64, 64), (64, 32, 64), (8, 128, 128)],
    18: [(64, 64, 64), (64, 32, 128), (32, 64, 128), (128, 16, 128),
         (16, 128, 128)],
    19: [(128, 64, 64), (64, 64, 128), (64, 128, 64), (32, 128, 128)],
    20: [(128, 64, 128), (64, 128, 128), (128, 128, 64), (64, 64, 256)],
}


def candidates(logn: int):
    """Candidate trees for one size: name -> (patch, out_t, gauss[, flat]).

    Always includes the status quo; adds inner-factor restructurings
    (dense leaf, transpose-free >=64 splits), the balanced dense-dense
    split where both factors fit _MAX_DIRECT, Gauss-leaf (g) /
    fused-transpose (t) toggles of the status-quo tree, and the
    zero-transpose flat chains (F...) from _FLAT_CANDS."""
    n = 1 << logn
    n1 = F._split_factors(n, 1 << 30)[0]
    n2 = n // n1
    cands = {"cur": ({}, False, None)}
    for fac in _FLAT_CANDS.get(logn, ()):
        name = "F" + "x".join(str(f) for f in fac)
        cands[name] = ({}, False, None, fac)
        cands[name + "g"] = ({}, False, 64, fac)
    # Gauss 3-matmul leaves / fused-transpose second leaf on the
    # status-quo tree (and combined) — cheap structural toggles
    cands["cur_g"] = ({}, False, 64)
    cands["cur_t"] = ({}, True, None)
    cands["cur_tg"] = ({}, True, 64)
    # per-LEVEL Gauss on the current tree (VERDICT r4 #9): (g1, g2)
    # applies Gauss to only the first / only the second root factor —
    # at 2^16 the tuned tree IS the balanced 256x256, where a size
    # threshold cannot tell the levels apart
    cands["cur_gl"] = ({}, False, (64, 1 << 30))
    cands["cur_gr"] = ({}, False, (1 << 30, 64))
    for fac, tag in ((n1, "l"), (n2, "r")):
        if F.MAX_RADIX < fac <= F._MAX_DIRECT:
            # recursing factor as one dense leaf: flop-heavy,
            # transpose-free
            cands[f"{tag}{fac}d"] = ({fac: 0}, False, None)
            # or split with a transpose-free (>=64) left leaf
            if fac > 128:
                cands[f"{tag}{fac}_64"] = ({fac: 64}, False, None)
                if fac // 128 >= 8:
                    cands[f"{tag}{fac}_128"] = ({fac: 128}, False, None)
                    cands[f"{tag}{fac}_128g"] = ({fac: 128}, False, 64)
    # big inner factors (> _MAX_DIRECT) can only be re-SPLIT: try
    # alternative left factors for them (the tuned standalone split was
    # measured at its own root operating point, not inside this tree)
    for fac, tag in ((n1, "l"), (n2, "r")):
        if fac > F._MAX_DIRECT:
            cur_split = F._split_factors(fac, 1 << 30, True)[0]
            for alt in {64, 128, 256} - {cur_split}:
                if fac % alt == 0:
                    cands[f"{tag}{fac}_{alt}"] = ({fac: alt}, False, None)
                    cands[f"{tag}{fac}_{alt}g"] = ({fac: alt}, False, 64)
    h = 1 << (logn // 2)
    if h <= F._MAX_DIRECT and h != n1:
        # balanced dense x dense (fewest levels), +fused-transpose leaf
        patch = {n: h, h: 0, n // h: 0}
        cands[f"b{h}"] = (patch, False, None)
        cands[f"b{h}t"] = (patch, True, None)
        cands[f"b{h}g"] = (patch, False, 64)
        # per-LEVEL Gauss (VERDICT r4 #9): a size threshold cannot
        # distinguish the two equal leaves of the balanced tree, so
        # these pass a (g1, g2) pair — Gauss on the first level only
        # (gl) or the second only (gr)
        off = 1 << 30
        cands[f"b{h}gl"] = (patch, False, (64, off))
        cands[f"b{h}gr"] = (patch, False, (off, 64))
    # leaf-sized alternative top splits (small transforms: the whole
    # tree is two leaf levels; which edge carries the MXU matters)
    for n1a in {16, 32, 64, 128} - {n1}:
        if n % n1a == 0 and n // n1a > 1:
            cands[f"s{n1a}"] = ({n: n1a}, False, None)
    # alternative TOP splits: a big-left tree (n1' = n/128 dense or
    # 64-rooted) trades recursion depth against leaf flops — untested by
    # the per-factor candidates above, which keep the tuned top split
    for n1a in {n // 128, 512, 1024} - {n1}:
        if F.MAX_RADIX < n1a <= F._MAX_DIRECT and n % n1a == 0 \
                and n // n1a >= 128:
            cands[f"t{n1a}d"] = ({n: n1a, n1a: 0}, False, None)
    return cands


def make_runner(logn: int, patch: dict, out_t: bool, iters: int,
                gauss=None, flat=None):
    n = 1 << logn
    batch = max(1, (32 << 20) // (8 * n))
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / np.sqrt(n)

    saved = {k: F._SPLIT_OVERRIDES.get(k) for k in patch}
    old_t = F._OUT_T_MIN_N2
    old_g = F._GAUSS_BY_ROOT.get(n, None)
    old_f = F._FLAT_PLANS.get(n, None)
    F._SPLIT_OVERRIDES.update(patch)
    F._OUT_T_MIN_N2 = 64 if out_t else (1 << 30)
    if gauss is None:
        F._GAUSS_BY_ROOT.pop(n, None)       # candidate trees are timed
        #                                     without the adopted gate
        #                                     unless explicitly g-tagged
    else:
        F._GAUSS_BY_ROOT[n] = gauss
    impl = "mm"
    if flat is not None:
        F._FLAT_PLANS[n] = tuple(flat)
        impl = "flat"
    try:
        @partial(jax.jit, static_argnums=1)
        def run(x, k):
            def body(i, x):
                return F.fft_split(x, -1, impl, scale=scale)
            return jax.lax.fori_loop(0, k, body, x)

        def sync(o):
            return float(jnp.sum(o[0][..., :1]))

        sync(run((re, im), 1))              # trace+compile with patch set
        sync(run((re, im), iters))
    finally:
        F._OUT_T_MIN_N2 = old_t
        if old_g is None:
            F._GAUSS_BY_ROOT.pop(n, None)
        else:
            F._GAUSS_BY_ROOT[n] = old_g
        if flat is not None:
            if old_f is None:
                F._FLAT_PLANS.pop(n, None)
            else:
                F._FLAT_PLANS[n] = old_f
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
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated candidate names to race")
    args = ap.parse_args()

    logn = args.logn
    n = 1 << logn
    # >=50ms chains at every size: the delta estimator divides
    # relay sync jitter by reps (same fix as bench_fft_sweep)
    iters = 200
    only = {c for c in args.only.split(",") if c}
    runners = {}
    for name, spec in candidates(logn).items():
        if only and name not in only:
            continue
        patch, out_t, gauss = spec[:3]
        flat = spec[3] if len(spec) > 3 else None
        print(f"compiling {name} {patch} out_t={out_t} gauss={gauss} "
              f"flat={flat} ...", file=sys.stderr, flush=True)
        runners[name] = make_runner(logn, patch, out_t, iters, gauss, flat)

    from opencl_fft_tpu.utils.profiling import median_chain_delta

    best = {v: float("inf") for v in runners}
    wins = {v: 0 for v in runners}
    for r in range(args.rounds):
        rnd = {}
        for v, (timed, batch) in runners.items():
            # repo timing convention (CLAUDE.md): median of >= 2
            # independent floor-guarded deltas; OMIT when fewer clear
            # the floor — a single min-kept delta ships drift artifacts
            floor = batch * n * 8 * 2 / 3e12
            dt, _nv = median_chain_delta(timed, iters - 1, floor)
            if dt is not None:
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
            print(f"{v:10s}: UNMEASURABLE", file=sys.stderr)
            continue
        gf = 5 * n * logn * batch / best[v] / 1e9
        print(f"{v:10s}: {best[v]*1e6:9.1f} us {gf:8.1f} GFLOP/s "
              f"wins={wins[v]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
