"""Benchmark driver — prints ONE JSON line on stdout.

Headline metric (the reference's own benchmark, csound/tests.py:19-34): the
real-time factor of streaming partitioned convolution — seconds of audio
processed per second of wall clock — with a 2^17-tap IR at 48 kHz streamed
in 512-sample partitions (the M=512 row of the reference's sweep, its most
latency-demanding configuration). BASELINE.json target: > 100x real time.

Secondary metrics (batched FFT GFLOP/s sweep 2^10..2^20, direct-conv and
TV-conv throughput) go to stderr and bench_details.json.

Methodology notes for this environment:
  * the TPU sits behind a relay with ~30 ms per host sync, so every timed
    region chains work on device (lax.scan / fori_loop) and measures the
    delta between a short and a long chain;
  * dispatch through the relay costs ~1-3 ms and donated state chains
    scans SEQUENTIALLY, so each timed dispatch must carry enough on-device
    work to swamp that latency: long scans (~40 s of audio per dispatch),
    few chained reps. First-time remote compiles of long scans are slow
    (minutes) but cached persistently across processes.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

SR = 48000.0


def _sync(x):
    import jax.numpy as jnp
    import jax
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :1]))


def _time_chained(fn, make_state, args, reps=4, warm=1):
    """Seconds per fn() call: chain state through repeated async dispatches,
    sync once, subtract a short chain to cancel dispatch+sync overhead."""
    import jax

    st, out = fn(make_state(), *args)
    _sync(out)                                   # compile + warm

    def run(n):
        st = make_state()
        t0 = time.time()
        out = None
        for _ in range(n):
            st, out = fn(st, *args)
        _sync(out)
        return time.time() - t0

    t_short = run(warm)
    t_long = run(warm + reps)
    return max(t_long - t_short, 1e-9) / reps


def bench_pconv_rt(pts=512, ir_len=1 << 17, tv=False, scan_blocks=1880):
    """Real-time factor of the streaming engine."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.standard_normal(ir_len), jnp.float32)
    base = jax.tree.map(np.asarray, P.push_ir(cfg, P.pconv_init(cfg), ir))

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, pts)) * 0.1,
                         jnp.float32)
    if tv:
        fn = jax.jit(partial(P.pconv_stream_tv, cfg), donate_argnums=(0,))
        args = (blocks, blocks)
    else:
        fn = jax.jit(partial(P.pconv_stream, cfg), donate_argnums=(0,))
        args = (blocks,)

    per_scan = _time_chained(fn, make_state, args)
    per_block = per_scan / scan_blocks
    return (pts / SR) / per_block, per_block


def bench_dconv(irsize=512, vsize=512, scan_blocks=1880):
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops import dconv as D

    cfg = D.DconvConfig(irsize=irsize, vsize=vsize)
    rng = np.random.default_rng(2)
    base = jax.tree.map(
        np.asarray,
        D.push_ir(cfg, D.dconv_init(cfg),
                  jnp.asarray(rng.standard_normal(irsize), jnp.float32)))

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, vsize)) * 0.1,
                         jnp.float32)
    fn = jax.jit(partial(D.dconv_stream, cfg), donate_argnums=(0,))
    per_scan = _time_chained(fn, make_state, (blocks,))
    per_block = per_scan / scan_blocks
    return (vsize / SR) / per_block


def bench_pconv_chunk(pts=512, ir_len=1 << 17, K=8, scan_blocks=1880,
                      ring_dtype="f32"):
    """Chunked streaming (K blocks per fused call, K-block latency)."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts, ring_dtype=ring_dtype)
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.standard_normal(ir_len), jnp.float32)
    base = jax.tree.map(np.asarray, P.push_ir(cfg, P.pconv_init(cfg), ir))

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(
        rng.standard_normal((scan_blocks // K, K, pts)) * 0.1, jnp.float32)

    def chunked(st, chunks):
        return jax.lax.scan(lambda s, c: P.pconv_chunk(cfg, s, c), st, chunks)

    fn = jax.jit(chunked, donate_argnums=(0,))
    per_scan = _time_chained(fn, make_state, (blocks,))
    per_block = per_scan / (blocks.shape[0] * K)
    return (pts / SR) / per_block


def bench_batched_serving(batch=64, pts=512, ir_len=1 << 17, scan_blocks=470):
    """Serving throughput: `batch` independent channels convolving against
    their own 2^17-tap IRs. Returns aggregate audio-seconds per wall second
    (channels x per-channel RT factor)."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.models.convolver import batched_state, _vmapped, _vmapped_push
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    rng = np.random.default_rng(3)
    irs = jnp.asarray(rng.standard_normal((batch, ir_len)) * 0.05, jnp.float32)
    st0 = jax.jit(_vmapped_push(cfg))(batched_state(cfg, batch), irs)
    base = jax.tree.map(np.asarray, st0)

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    step = _vmapped(P.pconv_step, cfg)

    def stream(st, blocks):
        return jax.lax.scan(lambda s, b: step(s, b), st, blocks)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, batch, pts)) * 0.1,
                         jnp.float32)
    fn = jax.jit(stream, donate_argnums=(0,))
    per_scan = _time_chained(fn, make_state, (blocks,))
    per_block = per_scan / scan_blocks
    return batch * (pts / SR) / per_block


def bench_fft_sweep():
    """Batched FFT GFLOP/s (5 N log2 N convention), 2^10..2^20."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops.fft import fft_split

    results = {}
    rng = np.random.default_rng(1)
    for logn in [10, 12, 14, 16, 18, 20]:
        n = 1 << logn
        batch = max(1, (32 << 20) // (8 * n))      # ~32MB working set
        re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

        @partial(jax.jit, static_argnums=1)
        def run(x, iters):
            def body(i, x):
                r, i_ = fft_split(x, -1, "mm")
                s = 1.0 / np.sqrt(n)
                return r * s, i_ * s
            return jax.lax.fori_loop(0, iters, body, x)

        iters = 200 if logn <= 14 else 50
        _sync(run((re, im), 1))
        _sync(run((re, im), iters))

        def best(k, tries=4):
            ts = []
            for _ in range(tries):
                t0 = time.time(); _sync(run((re, im), k)); ts.append(time.time() - t0)
            return min(ts)                     # min masks relay jitter

        dt = (best(iters) - best(1)) / (iters - 1)
        if dt <= 0:                            # jitter swamped the delta
            dt = (best(2 * iters) - best(1)) / (2 * iters - 1)
        dt = max(dt, 1e-9)
        gflops = 5 * n * logn * batch / dt / 1e9
        results[f"2^{logn}"] = {"batch": batch, "us": round(dt * 1e6, 1),
                                "gflops": round(gflops, 1)}
        print(f"  fft 2^{logn} batch={batch}: {dt*1e6:9.1f} us "
              f"{gflops:8.1f} GFLOP/s", file=sys.stderr)
    return results


def main():
    details = {}

    # two full estimates; keep the faster (min-time) one — relay throughput
    # drifts 2-3x between measurement windows
    rtf, per_block = bench_pconv_rt()
    rtf2, per_block2 = bench_pconv_rt()
    if rtf2 > rtf:
        rtf, per_block = rtf2, per_block2
    details["pconv_rt_factor_2^17_512"] = round(rtf, 1)
    details["pconv_us_per_block"] = round(per_block * 1e6, 1)
    print(f"pconv 2^17-tap @512: {rtf:.1f}x real time "
          f"({per_block*1e6:.0f} us/block)", file=sys.stderr)

    rtf_tv, _ = bench_pconv_rt(tv=True)
    details["tvconv_rt_factor_2^17_512"] = round(rtf_tv, 1)
    print(f"tvconv 2^17-tap @512: {rtf_tv:.1f}x real time", file=sys.stderr)

    rtf_d = bench_dconv()
    details["dconv_rt_factor_512tap"] = round(rtf_d, 1)
    print(f"dconv 512-tap: {rtf_d:.1f}x real time", file=sys.stderr)

    agg = bench_batched_serving()
    details["serving_64ch_audio_seconds_per_second"] = round(agg, 1)
    print(f"serving 64ch 2^17-tap: {agg:.0f} aggregate audio-s/s", file=sys.stderr)

    rtf_c = bench_pconv_chunk()
    details["pconv_chunk8_rt_factor"] = round(rtf_c, 1)
    print(f"pconv chunked K=8: {rtf_c:.1f}x real time", file=sys.stderr)

    rtf_cb = bench_pconv_chunk(ring_dtype="bf16")
    details["pconv_chunk8_bf16_rt_factor"] = round(rtf_cb, 1)
    print(f"pconv chunked K=8 bf16: {rtf_cb:.1f}x real time", file=sys.stderr)

    details["fft_sweep"] = bench_fft_sweep()

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    # Headline line for the driver (target: >100x real time, BASELINE.md)
    print(json.dumps({
        "metric": "pconv_realtime_factor_2^17tap_512pts",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
