"""Serving-scale curve: aggregate throughput vs channel count.

Measures the batched convolver engines (models/convolver.py) at batch
sizes 1..128 on the visible chip — the "convolution-reverb farm"
deployment shape. Per batch size, the vmapped XLA scan and the batched
whole-scan grid kernel (ops/pallas/streamstep.py, LTI and TV variants)
are timed INTERLEAVED (same relay-drift window, min over rounds, the
shared median_chain_delta estimator) and both arms land in the artifact
— the served number is whichever is faster, and the gate evidence is
checked in. Writes bench_results/serving_scaling.json.

Run:  python tools/serving_scaling.py [--rounds 3] [--tv]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np

SR = 48000.0
PTS = 512
IR_LEN = 1 << 17


def make_runners(batch: int, tv: bool, scan_blocks: int) -> dict:
    """One runner per arm: 'scan' (vmapped per-block XLA) and, where the
    batched kernel's VMEM gate passes, 'kernel' (whole-scan grid kernel
    in channel groups). Each runner times `reps` full scans."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.models.convolver import _vmapped_push, batched_state
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.pallas.streamstep import (
        fits_vmem_streamstep_batched, fits_vmem_streamstep_batched_tv)

    rng = np.random.default_rng(3)
    runners = {}
    arm_errors = {}

    def safe(name, thunk):
        # one arm's compile failure (e.g. a compile-helper crash at wide
        # batches) must not take down the other arm's measurement
        try:
            runners[name] = thunk()
        except Exception as e:  # noqa: BLE001 — recorded per arm
            arm_errors[name] = str(e)[:160]
            print(f"  arm '{name}' failed: {arm_errors[name]}",
                  file=sys.stderr, flush=True)

    def finish(fn, base, blocks_args):
        def run(reps):
            st = jax.tree.map(jnp.asarray, base)
            t0 = time.time()
            out = None
            for _ in range(reps):
                st, out = fn(st, *blocks_args)
            float(jnp.sum(out[..., :1]))
            return time.time() - t0

        run(1)                         # compile + warm
        return run

    K = 8      # chunk arm: K-block fused MAC, K blocks of added latency

    def chunked(step):
        # (scan_blocks, batch, pts) -> (scan_blocks/K, batch, K, pts) per
        # operand; bit-equal outputs to per-block streaming, amortizes the
        # per-block h + window HBM reads K-fold (the single-block
        # batch=64 roofline is ~134 MB/block -> <= ~3.4k aggregate)
        def fn(st, *cs):
            return jax.lax.scan(lambda s, c: step(s, *c), st, cs)
        return jax.jit(fn, donate_argnums=(0,))

    def to_chunks(b):
        return b.reshape(scan_blocks // K, K, batch, PTS).swapaxes(1, 2)

    if tv:
        cfg_off = P.PconvConfig.for_ir_length(IR_LEN, PTS, pallas="off")
        base = jax.tree.map(np.asarray, batched_state(cfg_off, batch))
        bx = jnp.asarray(rng.standard_normal((scan_blocks, batch, PTS)) * 0.1,
                         jnp.float32)
        bh = jnp.asarray(rng.standard_normal((scan_blocks, batch, PTS)) * 0.1,
                         jnp.float32)
        from opencl_fft_tpu.models.convolver import _vmapped
        # r4: scan-free TV chunked engine (batched TV decomposed per
        # K-chunk), forced via pallas="macflow" — at this resident-kernel
        # shape it is a measured NEGATIVE (601.9 vs scan 141.3 us at
        # batch=64) and the production auto path delegates to the
        # per-block engine (see pconv_stream_batched_tv_chunked); the
        # vmapped pconv_chunk_tv gather path is kept as the other
        # measured negative (same story as the LTI chunk8_gather)
        cfg_mf = P.PconvConfig.for_ir_length(IR_LEN, PTS, pallas="macflow")
        safe("chunk8", lambda: finish(
            jax.jit(partial(P.pconv_stream_batched_tv_chunked, cfg_mf,
                            K=K), donate_argnums=(0,)),
            base, (bx, bh)))
        safe("chunk8_gather", lambda: finish(
            chunked(_vmapped(P.pconv_chunk_tv, cfg_off)),
            base, (to_chunks(bx), to_chunks(bh))))
        # scan unroll amortizes the ~15us/iter backend loop overhead,
        # which only matters while the per-block work is tiny (see the
        # LTI note below)
        unroll = 4 if batch < 16 else 1
        safe("scan", lambda: finish(
            jax.jit(partial(P.pconv_stream_batched_tv, cfg_off,
                            unroll=unroll), donate_argnums=(0,)),
            base, (bx, bh)))
        if fits_vmem_streamstep_batched_tv(IR_LEN // PTS, PTS, 1):
            cfg_k = P.PconvConfig.for_ir_length(IR_LEN, PTS, pallas="stream")
            safe("kernel", lambda: finish(
                jax.jit(partial(P.pconv_stream_batched_tv, cfg_k),
                        donate_argnums=(0,)),
                base, (bx, bh)))
        return runners, arm_errors

    cfg_off = P.PconvConfig.for_ir_length(IR_LEN, PTS, pallas="off")
    irs = jnp.asarray(rng.standard_normal((batch, IR_LEN)) * 0.05,
                      jnp.float32)
    base = jax.tree.map(
        np.asarray,
        jax.jit(_vmapped_push(cfg_off))(batched_state(cfg_off, batch), irs))
    blocks = jnp.asarray(rng.standard_normal((scan_blocks, batch, PTS)) * 0.1,
                         jnp.float32)
    from opencl_fft_tpu.models.convolver import _vmapped
    # r4: the scan-free chunked engine (offline kernel per K-chunk);
    # the old vmapped-pconv_chunk arm is kept as the measured negative
    # its (K, nparts, bins) gather materialization made it (VERDICT r3
    # #4: 772 vs 4331 plain streaming)
    cfg_auto = P.PconvConfig.for_ir_length(IR_LEN, PTS)
    safe("chunk8", lambda: finish(
        jax.jit(partial(P.pconv_stream_batched_chunked, cfg_auto, K=K),
                donate_argnums=(0,)),
        base, (blocks,)))
    safe("chunk8_gather", lambda: finish(
        chunked(_vmapped(P.pconv_chunk, cfg_off)),
        base, (to_chunks(blocks),)))

    # bf16-ring serving precision point: halves the per-block ring
    # traffic that HBM-bounds wide-batch one-block-latency streaming
    # (~1e-3 relative output error; separate state — rings are bf16)
    def _bf16_runner():
        cfg_b = P.PconvConfig.for_ir_length(IR_LEN, PTS, pallas="off",
                                            ring_dtype="bf16")
        base_b = jax.tree.map(
            np.asarray,
            jax.jit(_vmapped_push(cfg_b))(batched_state(cfg_b, batch), irs))
        return finish(
            jax.jit(partial(P.pconv_stream_batched, cfg_b, unroll=1),
                    donate_argnums=(0,)),
            base_b, (blocks,))
    safe("scan_bf16", _bf16_runner)

    # scan unroll amortizes the ~15us/iter backend loop overhead, which
    # only matters while the per-block work is tiny; at wide batches the
    # x4 program bloat hurts scheduling (measured: batch=64 ran 1.07ms/
    # block unrolled vs ~0.25ms in bench.py's unroll-free program)
    unroll = 4 if batch < 16 else 1
    safe("scan", lambda: finish(
        jax.jit(partial(P.pconv_stream_batched, cfg_off, unroll=unroll),
                donate_argnums=(0,)),
        base, (blocks,)))
    if fits_vmem_streamstep_batched(IR_LEN // PTS, PTS, 1):
        cfg_k = P.PconvConfig.for_ir_length(IR_LEN, PTS, pallas="stream")
        safe("kernel", lambda: finish(
            jax.jit(partial(P.pconv_stream_batched, cfg_k),
                    donate_argnums=(0,)),
            base, (blocks,)))
    return runners, arm_errors


def measure(batch: int, tv: bool, rounds: int, reps: int,
            scan_blocks: int = 1880) -> dict:
    from opencl_fft_tpu.ops.pallas.streamstep import _STEP_GROUP
    from opencl_fft_tpu.utils.profiling import median_chain_delta

    # whole multiples of the kernel group keep the kernel arm pure (no
    # remainder-scan tail inside the timed program)
    scan_blocks -= scan_blocks % _STEP_GROUP
    nparts = IR_LEN // PTS
    try:
        runners, arm_errors = make_runners(batch, tv, scan_blocks)
    except Exception as e:                        # e.g. state-build failure
        return {"error": str(e)[:160]}
    if not runners:
        return {"error": "; ".join(f"{m}: {e}" for m, e in
                                   arm_errors.items()) or "no arms"}

    # physical floors (5x-generous: only impossible drift-collapsed
    # deltas are rejected). The scan streams batch x 4 ring planes of
    # (nparts, bins) f32 per block; the whole-scan kernel's only
    # per-block HBM traffic is the block in/out per channel (x2 input
    # rows for TV).
    fac = 2 if tv else 1
    floors = {
        "scan": max(batch * 4 * nparts * PTS * 4 / 3e12, 1e-6),
        "kernel": max(batch * (fac + 1) * PTS * 4 / 3e12, 0.02e-6),
        # chunk arm amortizes the 4-plane read over K=8 blocks
        "chunk8": max(batch * 4 * nparts * PTS * 4 / 8 / 3e12, 0.1e-6),
        # the measured-negative gather path reads at least as much as
        # the scan-free chunk engine (its K-fold gather materialization
        # only adds traffic) — same 5x-generous bound
        "chunk8_gather": max(batch * 4 * nparts * PTS * 4 / 8 / 3e12,
                             0.1e-6),
        # bf16 rings: 2-byte planes
        "scan_bf16": max(batch * 4 * nparts * PTS * 2 / 3e12, 0.5e-6),
    }
    # Publish the MEDIAN across rounds, not the min: each round's
    # median_chain_delta is robust within its window, but relay drift
    # flatters whole windows coherently and min-keeping then ships the
    # most flattered one (observed: batch=64 scan "106.5 us/block" where
    # the 134 MB/block of compulsory ring reads bound it to >= 164 us
    # even at HBM spec). One window must not set the served number —
    # same policy as bench.bench_fft_sweep. Winner = most round wins
    # (in-window ranking is drift-immune), ties broken by median.
    rows = {m: [] for m in runners}
    wins = {m: 0 for m in runners}
    for _ in range(rounds):                       # interleave over drift
        rnd = {}
        for m, run in runners.items():
            dt, _n = median_chain_delta(run, reps,
                                        floors[m] * scan_blocks, short=1,
                                        min_chain_s=0.05)
            if dt is not None:
                rnd[m] = dt / scan_blocks
                rows[m].append(dt / scan_blocks)
        if rnd:
            # wins decide the same-latency/precision winner below, so tally
            # them within that pool — a cross-class arm (chunk8 buys K
            # blocks of latency, scan_bf16 ~1e-3 error) taking the window
            # must not strip the production pool of its drift-immune signal
            pool_rnd = {m: t for m, t in rnd.items()
                        if m not in ("chunk8", "chunk8_gather",
                                     "scan_bf16")} or rnd
            wins[min(pool_rnd, key=pool_rnd.get)] += 1
    measured = {m: float(np.median(v)) for m, v in rows.items()
                if len(v) >= min(2, rounds)}
    if not measured:
        return {"unmeasurable": True}

    out = {}
    for m, t in measured.items():
        per_ch_rtf = (PTS / SR) / t
        out[m] = {
            "us_per_block_all_channels": round(t * 1e6, 1),
            "us_spread": [round(min(rows[m]) * 1e6, 1),
                          round(max(rows[m]) * 1e6, 1)],
            "rounds": len(rows[m]),
            "per_channel_rt_factor": round(per_ch_rtf, 1),
            "aggregate_audio_s_per_s": round(batch * per_ch_rtf, 1),
        }
    out["round_wins"] = {m: w for m, w in wins.items() if rows[m]}
    # winner compares same-latency, same-precision arms only: chunk8 buys
    # throughput with K blocks of added latency, scan_bf16 with ~1e-3
    # output error — both are reported alongside, never as the flat
    # one-block-latency f32 served number
    same_lat = {m: t for m, t in measured.items()
                if m not in ("chunk8", "scan_bf16")}
    pool = same_lat or measured
    # most in-window round wins first (drift-immune), median tie-break
    win = min(pool, key=lambda m: (-wins[m], pool[m]))
    out["winner"] = win
    if arm_errors:
        out["arm_errors"] = arm_errors            # evidence of lost arms
    out.update(out[win])                          # flat served numbers
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batches", type=str, default="1,4,16,64,128")
    ap.add_argument("--tv-batches", type=str, default="16,64",
                    help="batch sizes for the TV (dual-stream) arm pair")
    args = ap.parse_args()

    # seed from the existing artifact so a partial re-run (--batches with
    # a subset) refreshes only its points instead of dropping the rest
    results = {}
    try:
        with open("bench_results/serving_scaling.json") as f:
            results = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    jobs = [(int(b), False) for b in args.batches.split(",") if b] + \
           [(int(b), True) for b in args.tv_batches.split(",") if b]
    for batch, tv in jobs:
        r = measure(batch, tv, args.rounds, args.reps)
        tag = f"batch={batch}" + ("/tv" if tv else "")
        if r.get("unmeasurable") or r.get("error"):
            print(f"{tag}: unmeasurable ({r.get('error', 'relay glitch')})"
                  f", omitted", file=sys.stderr, flush=True)
            continue
        results[tag] = r
        arms = "  ".join(
            f"{m}={r[m]['us_per_block_all_channels']}us"
            for m in ("scan", "kernel", "chunk8", "scan_bf16") if m in r)
        print(f"{tag:14s}: {arms}  -> {r['winner']}  "
              f"{r['per_channel_rt_factor']:8.1f}x/ch "
              f"{r['aggregate_audio_s_per_s']:9.1f} agg audio-s/s",
              file=sys.stderr, flush=True)
    with open("bench_results/serving_scaling.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote bench_results/serving_scaling.json", file=sys.stderr)


if __name__ == "__main__":
    main()
