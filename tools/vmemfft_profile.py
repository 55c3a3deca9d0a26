"""Attribute the VMEM-resident FFT kernel's time to its stages.

The 3-level kernel (ops/pallas/vmemfft.py) measures ~2.5-3x above its
one-HBM-read+one-write floor at every large size (e.g. 2^17: ~320 us vs
a ~112 us DMA floor and ~97 us MXU ideal). This tool builds TRUNCATED
and DEGRADED variants of the same kernel — identical input DMA, same
total output bytes — and times them interleaved in one relay window so
the deltas attribute the overhead:

    dma        in->out copy only                 (DMA + grid pipeline floor)
    l1         L1 dot + twiddle                  (l1 - dma      = L1 cost)
    l12        L1 + L2 dots + twiddles           (l12 - l1      = L2 cost)
    full       production 3-level kernel         (full - l12    = L3 cost)
    full_notw  3 dots, twiddle mults skipped     (full - notw   = VPU twiddle)
    full_x1    bf16x1 stacks (2f, not 6f, WRONG  (stack/contraction-depth
               numerics - timing probe only)      share of the dot cost)

All variants write two float32 planes of rows*n elements, so HBM
traffic is constant; only in-VMEM compute varies. Timing is the same
chained fori_loop / min-over-reps / physical-floor methodology as
tools/vmemfft_ab.py (outputs are bitcast-reshaped back to the input
layout between iterations — free, no transpose).

    python tools/vmemfft_profile.py --logn 17 [--rounds 3] [--tb 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_fft_tpu.ops.pallas import vmemfft as V

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "bench_results", "vmemfft_profile.json")


def _kernel(f1, f2, f3, tb, stage, twiddle, stack6, scale,
            in_r, in_i, w1, w2, w3, t1r, t1i, t2r, t2i, out_r, out_i):
    """Parametrized copy of vmemfft._vmemfft_kernel.

    stage: 0 = copy only, 1 = L1, 2 = L1+L2, 3 = full. `stack6=False`
    uses bf16x1 operand stacks against the hi-only table halves (wrong
    numerics; identical dataflow shape at 1/3 contraction depth).
    """
    stk = V._stack6 if stack6 else (
        lambda re, im, axis: jnp.concatenate(
            [re.astype(jnp.bfloat16), im.astype(jnp.bfloat16)], axis=axis))

    def tbl(w, f):
        # (tb, 2f, 6f) stacked table -> hi-only (tb, 2f, 2f) for bf16x1
        return w if stack6 else w[..., : 2 * f]

    if stage == 0:
        out_r[:] = in_r[:].reshape(out_r.shape) * scale
        out_i[:] = in_i[:].reshape(out_i.shape) * scale
        return

    z = stk(in_r[:], in_i[:], axis=1)
    y = jax.lax.dot_general(tbl(w1[:], f1), z, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f1, :], y[:, f1:, :]
    if twiddle:
        tr, ti = t1r[:], t1i[:]
        re, im = re * tr - im * ti, re * ti + im * tr
    if stage == 1:
        out_r[:] = re.reshape(out_r.shape) * scale
        out_i[:] = im.reshape(out_i.shape) * scale
        return

    re = re.reshape(tb, f1, f2, f3)
    im = im.reshape(tb, f1, f2, f3)
    z = stk(re, im, axis=2)
    y = jax.lax.dot_general(tbl(w2[:], f2), z, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f2], y[:, f2:]
    if twiddle:
        tr, ti = t2r[:], t2i[:]
        tr = tr[None, :, None, :]
        ti = ti[None, :, None, :]
        re, im = re * tr - im * ti, re * ti + im * tr
    if stage == 2:
        out_r[:] = re.reshape(out_r.shape) * scale
        out_i[:] = im.reshape(out_i.shape) * scale
        return

    re = re.reshape(tb, f2 * f1, f3)
    im = im.reshape(tb, f2 * f1, f3)
    z = stk(re, im, axis=2)
    y = jax.lax.dot_general(tbl(w3[:], f3), z, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    out_r[:] = y[:, :f3, :] * scale
    out_i[:] = y[:, f3:, :] * scale


@functools.lru_cache(maxsize=None)
def _build(n, rows, tb, stage, twiddle, stack6, scale, interpret=False):
    f1, f2, f3, tb_def = V._PLANS[n]
    tb = tb or tb_def
    while rows % tb:
        tb //= 2
    sign = -1
    tables = [
        V._leaf_stacked_np(f1, sign, tb),
        V._leaf_stacked_np(f2, sign, tb),
        V._leaf_stacked_np(f3, sign, tb),
        *V._twiddle_np(f1, f2 * f3, sign),
        *V._twiddle_np(f2, f3, sign),
    ]
    kern = functools.partial(_kernel, f1, f2, f3, tb, stage, twiddle,
                             stack6, scale)
    table_specs = [pl.BlockSpec(t.shape,
                                (lambda nd: lambda b: (0,) * nd)(t.ndim),
                                memory_space=pltpu.VMEM) for t in tables]
    # out canvas per stage (same element count; fresh layout per stage)
    oshape = {0: (f1, f2 * f3), 1: (f1, f2 * f3),
              2: (f2, f1 * f3), 3: (f3, f2 * f1)}[stage]
    call = pl.pallas_call(
        kern,
        grid=(rows // tb,),
        out_shape=tuple(jax.ShapeDtypeStruct((rows,) + oshape, jnp.float32)
                        for _ in range(2)),
        in_specs=[pl.BlockSpec((tb, f1, f2 * f3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * 2 + table_specs,
        out_specs=tuple(pl.BlockSpec((tb,) + oshape, lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(2)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=V._VMEM_LIMIT),
        interpret=interpret,
    )

    def apply(x):
        re, im = x
        f1_, _, _, _ = V._PLANS[n]
        r, i = call(re.reshape(rows, f1_, n // f1_),
                    im.reshape(rows, f1_, n // f1_), *tables)
        return r.reshape(rows, n), i.reshape(rows, n)

    return apply


VARIANTS = {
    # name -> (stage, twiddle, stack6, growth_factors)
    "dma":       (0, True, True, 1.0),
    "l1":        (1, True, True, None),        # growth sqrt(f1)
    "l12":       (2, True, True, None),        # growth sqrt(f1 f2)
    "full":      (3, True, True, None),        # growth sqrt(n)
    "full_notw": (3, False, True, None),
    "full_x1":   (3, True, False, None),
}


def make_runner(n, rows, tb, name, iters, interpret=False):
    f1, f2, f3, _ = V._PLANS[n]
    stage, twiddle, stack6, scale = VARIANTS[name]
    if scale is None:
        scale = 1.0 / np.sqrt({1: f1, 2: f1 * f2, 3: n}[stage])
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    apply = _build(n, rows, tb, stage, twiddle, stack6, float(scale),
                   interpret)

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, k):
        return jax.lax.fori_loop(0, k, lambda i, x: apply(x), x)

    def sync(o):
        return float(jnp.sum(o[0][..., :1]))

    t0 = time.time()
    sync(run((re, im), 1))
    compile_s = time.time() - t0
    sync(run((re, im), iters))

    def timed(k):
        t0 = time.time(); sync(run((re, im), k)); return time.time() - t0

    return timed, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=17)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tb", type=int, default=0)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()
    n = 1 << args.logn
    rows = max(1, (32 << 20) // (8 * n))
    # >=50ms chains so relay sync jitter / iters stays small
    # (same fix as bench_fft_sweep / vmemfft_ab)
    iters = 200
    names = args.variants.split(",") if args.variants else list(VARIANTS)

    runners = {}
    for v in names:
        t0 = time.time()
        try:
            runners[v] = make_runner(n, rows, args.tb, v, iters)
            print(f"compiled {v} in {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f"{v}: SKIP ({str(e)[:120]})", file=sys.stderr, flush=True)

    floor = rows * n * 8 * 2 / 3e12
    best = {v: float("inf") for v in runners}
    for r in range(args.rounds):
        for v, (timed, _) in runners.items():
            dt = (min(timed(iters) for _ in range(args.reps))
                  - min(timed(1) for _ in range(args.reps))) / (iters - 1)
            if dt > floor:
                best[v] = min(best[v], dt)
    row = {"rows": rows, "tb": args.tb or V._PLANS[n][3]}
    for v in runners:
        us = best[v] * 1e6 if np.isfinite(best[v]) else None
        row[v] = round(us, 1) if us else None
        print(f"2^{args.logn} {v:10s}: "
              f"{us and f'{us:8.1f} us' or 'UNMEASURABLE'}",
              file=sys.stderr, flush=True)
    fin = {v: t for v, t in best.items() if np.isfinite(t)}
    if {"dma", "l1", "l12", "full"} <= fin.keys():
        attr = {
            "dma_floor_us": fin["dma"] * 1e6,
            "L1_us": (fin["l1"] - fin["dma"]) * 1e6,
            "L2_us": (fin["l12"] - fin["l1"]) * 1e6,
            "L3_us": (fin["full"] - fin["l12"]) * 1e6,
        }
        if "full_notw" in fin:
            attr["twiddle_us"] = (fin["full"] - fin["full_notw"]) * 1e6
        if "full_x1" in fin:
            attr["stack_depth_us"] = (fin["full"] - fin["full_x1"]) * 1e6
        row["attribution"] = {k: round(u, 1) for k, u in attr.items()}
        for k, u in row["attribution"].items():
            print(f"  {k:16s} {u:8.1f}", file=sys.stderr, flush=True)
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results[f"2^{args.logn}"] = row
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"merged -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
