"""On-chip cost of zero latency: interleaved A/B of the non-uniform
(Gardner) convolver against the two uniform engines that bracket it.

Arms (same impulse-response length, measured round-robin in the same
relay window, us per 64-sample base block):

  zl      ZeroLatencyConvolver step      — added latency 0 samples
  uni64   uniform pconv at pts=block     — added latency 64 samples
                                           (the reference's only way to
                                           approach low latency:
                                           csound/opcode.cpp:240-249)
  uniPMAX uniform pconv at pts=pmax      — added latency pmax samples
                                           (the throughput champion the
                                           bench sweep publishes)

Each arm is a loop-carried lax.fori_loop chain (the output block feeds
the next input, so steps serialize on-device); deltas are guarded by a
physical HBM floor and chains auto-sized to span >= ~50 ms of device
work (CLAUDE.md chain conventions). Writes bench_results/zl_probe.json.

    python tools/zl_probe.py [--taps 65536] [--block 64] [--pmax 1024]
                             [--rounds 3]
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

from opencl_fft_tpu.models.lowlatency import ZeroLatencyConvolver
from opencl_fft_tpu.ops import pconv as P

SR = 44100.0


def _chain(step, state0, x0):
    """Loop-carried chain: returns timed(k) after warm compiles."""

    @partial(jax.jit, static_argnums=1)
    def run(carry, k):
        def body(i, c):
            st, x = c
            st, y = step(st, x)
            return st, y
        return jax.lax.fori_loop(0, k, body, carry)

    def sync(c):
        return float(jnp.sum(c[1][..., :1]))

    def timed(k):
        t0 = time.time()
        sync(run((state0, x0), k))
        return time.time() - t0

    return timed, sync, run


def make_zl(taps, block, pmax, rng):
    ir = (rng.standard_normal(taps) * 0.05).astype(np.float32)
    zl = ZeroLatencyConvolver(ir, block=block, pmax=pmax)
    x0 = jnp.asarray(rng.standard_normal(block), jnp.float32)
    step = zl._make_step()
    # min device traffic per base block: amortized ring+IR reads of every
    # segment engine (re+im f32 each), head window, plus I/O blocks
    bytes_pb = 2 * block * 4.0
    for s in zl.segments:
        bytes_pb += (3 * s.nparts * s.pts * 2 * 4.0) * block / s.pts
    return step, zl.state, x0, bytes_pb, 1


def make_uni(taps, pts, rng):
    cfg = P.PconvConfig.for_ir_length(taps, pts)
    ir = (rng.standard_normal(cfg.cvs) * 0.05).astype(np.float32)
    st = P.push_ir(cfg, P.pconv_init(cfg), jnp.asarray(ir))
    x0 = jnp.asarray(rng.standard_normal(pts), jnp.float32)
    step = lambda s, x: P.pconv_step(cfg, s, x)
    bytes_pb = 3 * cfg.nparts * cfg.bins * 2 * 4.0 + 2 * pts * 4.0
    return step, st, x0, bytes_pb, 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taps", type=int, default=65536)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--pmax", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="bench_results/zl_probe.json")
    args = ap.parse_args()
    rng = np.random.default_rng(7)
    B = args.block

    arms = {
        "zl": make_zl(args.taps, B, args.pmax, rng) + (0,),
        "uni64": make_uni(args.taps, B, rng) + (B,),
        f"uni{args.pmax}": make_uni(args.taps, args.pmax, rng)
        + (args.pmax,),
    }

    runners = {}
    for name, (step, st, x0, bytes_pb, _one, latency) in arms.items():
        blocks_per_step = x0.shape[0] // B   # engine cadence vs base block
        timed, sync, run = _chain(step, st, x0)
        sync(run((st, x0), 1))                       # compile both trip counts
        t_probe = min(timed(256) for _ in range(2)) - min(
            timed(1) for _ in range(2))
        est = max(t_probe / 255, 1e-7)
        iters = int(np.clip(np.ceil(0.05 / est), 512, 1 << 16))
        sync(run((st, x0), iters))                   # compile the final chain
        # bytes_pb is already per chain ITERATION (per base block for zl,
        # per engine block for the uniform arms) — no cadence scaling
        floor = bytes_pb / 3e12
        runners[name] = (timed, iters, floor, blocks_per_step, latency)
        print(f"{name}: est {est*1e6:.2f} us/step, chain iters={iters}",
              file=sys.stderr, flush=True)

    best = {v: float("inf") for v in runners}
    wins = {v: 0 for v in runners}
    for _ in range(args.rounds):
        rnd = {}
        for v, (timed, iters, floor, bps, _lat) in runners.items():
            dt = (min(timed(iters) for _ in range(2))
                  - min(timed(1) for _ in range(2))) / (iters - 1)
            if dt > floor:
                per_block = dt / bps
                best[v] = min(best[v], per_block)
                rnd[v] = per_block
        if rnd:
            wins[min(rnd, key=rnd.get)] += 1

    results = {"_comment": ("us per 64-sample base block, interleaved rounds, "
                            "min over rounds with physical floors; the signal "
                            "is the in-window RATIO zl/uni64 (what zero "
                            "latency costs vs the only uniform engine in the "
                            "same latency class) — absolute numbers drift "
                            "2-3x between relay windows"),
               "taps": args.taps, "block": B, "pmax": args.pmax}
    for v, (_t, _i, _f, _b, lat) in runners.items():
        if not np.isfinite(best[v]):
            print(f"{v}: UNMEASURABLE", file=sys.stderr, flush=True)
            results[v] = None
            continue
        rt = (B / SR) / best[v]
        results[v] = {"us_per_block": round(best[v] * 1e6, 2),
                      "x_realtime": round(rt, 1),
                      "added_latency_samples": lat}
        print(f"{v:8s}: {best[v]*1e6:8.2f} us/block  {rt:7.1f}x RT  "
              f"latency {lat}", file=sys.stderr, flush=True)
    results["round_wins"] = wins
    if np.isfinite(best["zl"]) and np.isfinite(best["uni64"]):
        results["zl_vs_uni64"] = round(best["zl"] / best["uni64"], 3)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
