"""On-chip validation + timing of the decomposed (macflow) engine.

Two jobs, run on the target TPU:

  --check          correctness: decomposed TV/LTI vs the sequential scan
                   at a modest shape where the scan is safe to compile
                   (the r3 wedge warning applies at nparts >= 4096 —
                   never compile the scan arm there).
  --time CELLS     timing at the sweep cells the r3 grid left on the
                   scan: comma-separated pts:log2L (e.g. "512:22,2048:21").
                   Only the DECOMPOSED arm is compiled; the scan baseline
                   is the committed r3 sweep value (bench_results/
                   sweep.json), so no jumbo scan compile can wedge the
                   relay. Prints us/block and the RT ratio at sr=44100.
  --lti            time the LTI engine instead of time-varying.

Estimator: utils.profiling.median_chain_delta with the decomposed
floor (4 window planes per 8-block group through 5x-generous 3 TB/s).
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

SR = 44100.0


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :1]))


def check(pts=512, ir_len=1 << 18, nb=64):
    """Decomposed == scan on-chip (both Mosaic-compiled), TV and LTI."""
    import dataclasses

    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.decomposed import stream_decomposed

    cfg = P.PconvConfig.for_ir_length(ir_len, pts, pallas="off")
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.standard_normal(ir_len) * 0.3, jnp.float32)
    st = P.push_ir(cfg, P.pconv_init(cfg), ir)
    bx = jnp.asarray(rng.standard_normal((nb, pts)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((nb, pts)) * 0.2, jnp.float32)

    dcfg = dataclasses.replace(cfg, pallas="macflow")
    for tv in (False, True):
        args = (bx, bh) if tv else (bx,)
        _, out_s = (P.pconv_stream_tv if tv else P.pconv_stream)(
            cfg, st, *args)
        st_d, out_d = stream_decomposed(dcfg, st, *args)
        err = float(jnp.max(jnp.abs(out_d - out_s)))
        ref = float(jnp.max(jnp.abs(out_s)))
        ok = err <= 3e-5 * max(1.0, ref)
        print(f"  {'tv' if tv else 'lti'} decomposed vs scan "
              f"(pts={pts}, nparts={cfg.nparts}, nb={nb}): "
              f"max err {err:.2e} (ref {ref:.2e}) "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
        if not ok:
            return False
    return check_batched_tv(pts, ir_len)


def check_batched_tv(pts=512, ir_len=1 << 18, nb=16, nch=2):
    """Batched TV chunked engine (macflow_tv_batched) vs the per-block
    batched scan on-chip."""
    from opencl_fft_tpu.models.convolver import batched_state
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts, pallas="off")
    rng = np.random.default_rng(1)
    st = batched_state(cfg, nch)
    bx = jnp.asarray(rng.standard_normal((nb, nch, pts)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((nb, nch, pts)) * 0.2, jnp.float32)
    _, out_s = P.pconv_stream_batched_tv(cfg, st, bx, bh)
    import dataclasses
    mcfg = dataclasses.replace(cfg, pallas="macflow")
    _, out_d = P.pconv_stream_batched_tv_chunked(mcfg, st, bx, bh, K=8)
    err = float(jnp.max(jnp.abs(out_d - out_s)))
    ref = float(jnp.max(jnp.abs(out_s)))
    ok = err <= 3e-5 * max(1.0, ref)
    print(f"  batched tv chunked vs scan (pts={pts}, nparts={cfg.nparts}, "
          f"nb={nb}, nch={nch}): max err {err:.2e} (ref {ref:.2e}) "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def time_cell(pts: int, ir_len: int, tv: bool, scan_blocks=512, reps=4,
              rounds=3):
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.decomposed import stream_decomposed
    from opencl_fft_tpu.utils.profiling import median_chain_delta

    cfg = P.PconvConfig.for_ir_length(ir_len, pts, pallas="macflow")
    rng = np.random.default_rng(0)
    base = jax.tree.map(np.asarray, P.pconv_init(cfg))
    bx = jnp.asarray(rng.standard_normal((scan_blocks, pts)) * 0.1,
                     jnp.float32)
    if tv:
        fn = jax.jit(partial(stream_decomposed, cfg), donate_argnums=(0,))
        args = (bx, bx)
    else:
        fn = jax.jit(lambda s, b: stream_decomposed(cfg, s, b),
                     donate_argnums=(0,))
        args = (bx,)

    def run(n):
        st = jax.tree.map(jnp.asarray, base)
        t0 = time.time()
        out = None
        for _ in range(n):
            st, out = fn(st, *args)
        _sync(out)
        return time.time() - t0

    t0 = time.time()
    run(1)
    print(f"  compile+warm {time.time()-t0:.1f}s", flush=True)
    floor_block = max(4 * cfg.nparts * cfg.bins * 4 / 8 / 3e12, 0.02e-6)
    best = float("inf")
    for _ in range(rounds):
        dt, _n = median_chain_delta(run, reps, floor_block * scan_blocks,
                                    min_chain_s=0.05)
        if dt is not None:
            best = min(best, dt / scan_blocks)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--time", type=str, default=None,
                    help="pts:log2L[,pts:log2L...]")
    ap.add_argument("--lti", action="store_true")
    ap.add_argument("--blocks", type=int, default=512)
    args = ap.parse_args()

    if args.check:
        ok = check()
        if not ok:
            raise SystemExit(1)
    if args.time:
        out = {}
        sweep = {}
        try:
            sweep = json.load(open("bench_results/sweep.json"))
        except Exception:
            pass
        for tok in args.time.split(","):
            p, ll = tok.split(":")
            pts, L = int(p), 1 << int(ll)
            per_block = time_cell(pts, L, tv=not args.lti,
                                  scan_blocks=args.blocks)
            if per_block == float("inf"):
                print(f"  M={pts} L=2^{ll}: unmeasurable", flush=True)
                continue
            rt = (pts / SR) / per_block
            prior = sweep.get(f"M={pts},L=2^{ll}")
            out[tok] = {"us_per_block": round(per_block * 1e6, 2),
                        "rt": round(rt, 1), "prior_rt": prior}
            print(f"  M={pts} L=2^{ll}: {per_block*1e6:.2f} us/block "
                  f"= {rt:.0f}x RT (r3 sweep: {prior})", flush=True)
        with open("bench_results/macflow_times.json", "w") as f:
            json.dump(out, f, indent=2)
        print("wrote bench_results/macflow_times.json", flush=True)


if __name__ == "__main__":
    main()
