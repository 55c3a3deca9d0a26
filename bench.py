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
import os
import sys
import time
from functools import partial

try:
    import numpy as np
except ModuleNotFoundError:  # bare interpreter: fall back to the baked venv
    sys.path.append("/opt/venv/lib/python3.12/site-packages")
    import numpy as np
    # Site startup already ran (and failed) the TPU-plugin registration
    # hook before the stack was importable — re-run it now, before any
    # jax import, so the pinned JAX_PLATFORMS backend actually exists.
    import os as _os
    _sc = "/root/.axon_site/sitecustomize.py"
    if _os.path.exists(_sc):
        try:
            import importlib.util as _ilu
            _spec = _ilu.spec_from_file_location("_axon_sitecustomize", _sc)
            _spec.loader.exec_module(_ilu.module_from_spec(_spec))
        except Exception as _e:
            # If registration truly failed, the pinned JAX_PLATFORMS
            # backend is missing and jax will die later with an
            # unrelated-looking error — name the root cause here.
            print(f"warning: TPU plugin registration hook failed: {_e!r}",
                  file=sys.stderr)

SR = 48000.0


def _sync(x):
    import jax.numpy as jnp
    import jax
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :1]))


class Unmeasurable(RuntimeError):
    """Timing delta fell below the physical floor after retries: relay
    jitter swamped the measurement. Callers OMIT the metric (loudly)
    rather than publish a garbage number."""


def _time_chained_fori(step, make_state, args, floor_s=0.0, reps=3):
    """Seconds per step() call, with the repetition chained ON DEVICE in
    a fori_loop — ONE dispatch per timed chain.

    Why this replaces the Python-loop chain for the state-chained
    metrics: the r5 serving diagnosis (tools/serving_diag.py ->
    bench_results/serving_diag.json) interleaved the serving measurement
    with a fixed-cost on-device-chained sentinel matmul. The sentinel
    held MXU peak (71-93 us/iter) across every window while the
    Python-loop-chained serving reading swung 310 -> 4457 audio-s/s —
    the 14-19x "serving spread" was relay DISPATCH congestion entering
    the timed region once per chained call, not chip drift and not
    engine bimodality. A fori chain pays dispatch+sync ONCE per chain
    regardless of reps, and the long-minus-short delta cancels that too.

    step: raw callable (state, *args) -> (state, out). The output is
    folded into a checksum carried through the loop so XLA cannot
    dead-code-eliminate the compute that only feeds `out` (e.g. the
    dconv FIR dot, whose state update alone would keep none of it).
    Static trip counts: reps stays FIXED (growth would recompile per
    reps value); pick reps so the chain spans >= ~50 ms of device work.

    State provisioning: the base state uploads to the device ONCE and
    every timed call gets a fresh DEVICE-SIDE copy, forced complete
    before the clock starts. Re-uploading per call (the old pattern)
    ships up to ~134 MB through the relay TUNNEL asynchronously, and
    the transfer tail lands inside the timed region — the r5 validation
    run still swung 3x after the fori fix until this was removed.
    """
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.utils.profiling import median_chain_delta

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def run_k(st, k):
        def body(i, carry):
            st, acc = carry
            st2, out = step(st, *args)
            return st2, acc + jnp.sum(out)
        return jax.lax.fori_loop(0, k, body,
                                 (st, jnp.float32(0.0)))

    base = jax.tree.map(jnp.asarray, make_state())
    for leaf in jax.tree.leaves(base):        # force the one-time upload
        float(jnp.sum(jnp.ravel(leaf)[:1]))

    @jax.jit
    def fresh(s):                             # device-side copy, no donation
        return jax.tree.map(lambda a: a * 1, s)

    def timed(k):
        st = fresh(base)
        float(jnp.sum(jnp.ravel(jax.tree.leaves(st)[0])[:1]))  # copy done
        t0 = time.time()
        float(run_k(st, k)[1])
        return time.time() - t0

    timed(1)                                   # compile both trip counts
    timed(1 + reps)
    floor = max(floor_s, 1e-7)
    # min_chain_s growth recompiles run_k at the grown static trip count
    # (inner program cached — cheap relative to a jitter-poisoned chain)
    dt, n = median_chain_delta(timed, reps, floor, min_chain_s=0.05)
    if dt is None:
        raise Unmeasurable(
            f"only {n} physical timing delta(s) above floor "
            f"{floor:.3e}s -- relay window unusable")
    return dt


def _mac_floor_s(nparts, bins, blocks, batch=1, bw=3e12):
    """Lower bound on seconds per call for a pconv-style streamed scan:
    the spectral MAC must read 4 ring planes (x/h, re/im) per block. bw is
    deliberately ~5x the measured ~600 GB/s HBM so the floor only rejects
    physically impossible numbers, never merely fast ones."""
    bytes_per_block = 4 * nparts * bins * 4 * batch
    return max(blocks * bytes_per_block / bw, 0.2e-6 * blocks)


def _stream_floor_s(cfg, blocks, batch=1, bw=3e12, tv=False):
    """Physical floor for the streaming engine, aware of the grid-streamed
    kernel: when it carries the scan the ring planes stay VMEM-resident
    across blocks, so the only per-block HBM traffic is the (pts,) block
    in and out — the MAC-plane floor would reject its legitimate speed."""
    if cfg._use_stream_kernel(tv=tv):
        return max(blocks * 2 * cfg.pts * 4 * batch / bw, 0.02e-6 * blocks)
    if cfg._use_decomposed_stream(tv=tv):
        # operand windows stream once per group (ops/decomposed); use
        # the MAXIMUM group size (macflow pick_group caps gb at 32) so
        # the floor stays 5x-generous for every dispatched group
        return max(blocks * 4 * cfg.nparts * cfg.bins * 4 * batch / 32 / bw,
                   0.02e-6 * blocks)
    return _mac_floor_s(cfg.nparts, cfg.bins, blocks, batch=batch, bw=bw)


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
        step = partial(P.pconv_stream_tv, cfg)
        args = (blocks, blocks)
    else:
        step = partial(P.pconv_stream, cfg)
        args = (blocks,)

    per_scan = _time_chained_fori(
        step, make_state, args,
        floor_s=_stream_floor_s(cfg, scan_blocks, tv=tv), reps=16)
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
    # whole-scan kernel regime: per-block HBM traffic is only the block
    # in/out, so the scan-path heuristic floor would reject its speed
    floor_block = 0.02e-6 if cfg._use_stream_kernel() else 0.2e-6
    per_scan = _time_chained_fori(partial(D.dconv_stream, cfg), make_state,
                                  (blocks,),
                                  floor_s=floor_block * scan_blocks, reps=16)
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

    nblocks = blocks.shape[0] * K
    ring_bytes = 2 if ring_dtype == "bf16" else 4
    floor = max(nblocks * 4 * cfg.nparts * cfg.bins * ring_bytes / 3e12,
                0.2e-6 * nblocks)
    per_scan = _time_chained_fori(chunked, make_state, (blocks,),
                                  floor_s=floor, reps=16)
    per_block = per_scan / nblocks
    return (pts / SR) / per_block


def bench_pconv_offline(pts=512, ir_len=1 << 17, scan_blocks=1880):
    """Offline render throughput (chunk-MAC kernel, no sequential scan;
    latency = render length). Floor: the sliding windows re-read each
    timeline row nparts/8 times -> bytes/block = 2 planes * (nparts+8) *
    bins * 4 / 8."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    if not P._use_chunkmac(cfg):
        raise Unmeasurable("chunk-MAC kernel ineligible on this backend")
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.standard_normal(ir_len), jnp.float32)
    base = jax.tree.map(np.asarray, P.push_ir(cfg, P.pconv_init(cfg), ir))

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, pts)) * 0.1,
                         jnp.float32)
    floor = max(scan_blocks * 2 * (cfg.nparts + 8) * cfg.bins * 4 / 8 / 3e12,
                0.02e-6 * scan_blocks)
    per_scan = _time_chained_fori(partial(P.pconv_offline, cfg), make_state,
                                  (blocks,), floor_s=floor, reps=16)
    per_block = per_scan / scan_blocks
    return (pts / SR) / per_block


def bench_serving_offline(batch=16, pts=512, ir_len=1 << 17, scan_blocks=470):
    """Offline serving throughput: `batch` channels rendered through the
    chunk-MAC kernel's channel grid. Aggregate audio-s/s. batch=16 is
    the measured crossover sweet spot (chunkmac.CHUNKMAC_MAX_BATCH):
    above it the per-program window DMAs contend and the streaming scan
    (bench_batched_serving) wins."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.models.convolver import batched_state, _vmapped_push
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.pallas.chunkmac import CHUNKMAC_MAX_BATCH

    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    if not P._use_chunkmac(cfg) or batch > CHUNKMAC_MAX_BATCH:
        raise Unmeasurable("chunk-MAC kernel ineligible on this backend")
    rng = np.random.default_rng(3)
    irs = jnp.asarray(rng.standard_normal((batch, ir_len)) * 0.05, jnp.float32)
    st0 = jax.jit(_vmapped_push(cfg))(batched_state(cfg, batch), irs)
    base = jax.tree.map(np.asarray, st0)

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, batch, pts)) * 0.1,
                         jnp.float32)
    floor = max(batch * scan_blocks * 2 * (cfg.nparts + 8) * cfg.bins * 4 / 8
                / 3e12, 0.02e-6 * scan_blocks)
    per_scan = _time_chained_fori(partial(P._offline_batched, cfg),
                                  make_state, (blocks,), floor_s=floor,
                                  reps=8)
    per_block = per_scan / scan_blocks
    return batch * (pts / SR) / per_block


def bench_batched_serving(batch=64, pts=512, ir_len=1 << 17, scan_blocks=470,
                          ring_dtype="f32"):
    """Serving throughput: `batch` independent channels convolving against
    their own 2^17-tap IRs. Returns aggregate audio-seconds per wall second
    (channels x per-channel RT factor).

    ring_dtype="bf16" trades ~1e-3 relative output error for halved
    ring BYTES (products still accumulate in f32). The r5 de-noised
    measurement ADJUDICATED the r4 inversion as real, not drift: bf16
    serves 3361 vs f32's 4763 audio-s/s with 1.01-1.03x spreads in
    adjacent windows (bench_details.json). Why: the f32 engine's
    throughput implies ~926 GB/s of naive per-block ring traffic —
    above the chip's HBM — so XLA is NOT re-streaming the full rings
    every block (partial residency/fused re-reads); the halved bytes
    buy little, while every MAC pays bf16->f32 conversion on the VPU.
    bf16 rings remain an option for HBM-FOOTPRINT relief (half-size
    states for more channels per chip), not a throughput knob at this
    shape."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.models.convolver import batched_state, _vmapped_push
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts, ring_dtype=ring_dtype)
    rng = np.random.default_rng(3)
    irs = jnp.asarray(rng.standard_normal((batch, ir_len)) * 0.05, jnp.float32)
    st0 = jax.jit(_vmapped_push(cfg))(batched_state(cfg, batch), irs)
    base = jax.tree.map(np.asarray, st0)

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, batch, pts)) * 0.1,
                         jnp.float32)
    # routes through the batched grid-streamed kernel when measured-on
    # (channel groups VMEM-resident); falls back to the vmapped scan.
    # Mirror pconv_stream_batched's ACTUAL gate (classic impl + batched
    # fit): _use_stream_kernel alone can be true via the split impl,
    # whose batched variant does not exist — the tiny stream floor would
    # then let drift-collapsed scan readings through.
    from opencl_fft_tpu.ops.pallas import _tuned
    from opencl_fft_tpu.ops.pallas.streamstep import \
        fits_vmem_streamstep_batched
    cross = getattr(_tuned, "BATCHED_KERNEL_MAX_CH", {}).get("lti")
    if (cfg._stream_kernel_impl() == "classic"
            and fits_vmem_streamstep_batched(cfg.nparts, cfg.bins, 1)
            and (cross is None or batch <= cross)):
        floor = max(scan_blocks * 2 * pts * 4 * batch / 3e12,
                    0.02e-6 * scan_blocks)
    else:
        floor = _mac_floor_s(cfg.nparts, cfg.bins, scan_blocks, batch=batch)
        if ring_dtype == "bf16":
            floor /= 2          # ring planes are 2 bytes, not 4
    per_scan = _time_chained_fori(partial(P.pconv_stream_batched, cfg),
                                  make_state, (blocks,), floor_s=floor,
                                  reps=3)
    per_block = per_scan / scan_blocks
    return batch * (pts / SR) / per_block


def bench_batched_serving_chunked(batch=64, pts=512, ir_len=1 << 17, K=8,
                                  scan_blocks=472):
    """Latency-relaxed serving throughput: K-block chunked streaming of
    `batch` channels (matches per-block streaming within f32 tolerance,
    at the price of K blocks of added latency — 85 ms at K=8, pts=512,
    48 kHz).

    Why it exists: the one-block-latency batched stream is HBM-roofline
    bound — every block must re-read all channels' h spectra plus an
    nparts-deep ring window (batch=64, 2^17 taps: ~134 MB/block f32 ->
    >= ~224 us/block at the measured ~600 GB/s, i.e. <= ~3.4k aggregate
    audio-s/s no matter how good the kernel is). Chunking K blocks
    through the scan-free offline engine amortizes that traffic across
    each 8-output group, which is the correct serving-farm operating
    point whenever the deployment tolerates a few dozen ms of latency.
    (The r3 path here — a vmapped pconv_chunk — materialized
    (K, nparts, bins) gather windows per channel and measured 5.6x
    SLOWER than plain streaming; replaced per VERDICT r3 #4 by
    pconv_stream_batched_chunked.)"""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.models.convolver import _vmapped_push, batched_state
    from opencl_fft_tpu.ops import pconv as P

    assert scan_blocks % K == 0
    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    rng = np.random.default_rng(3)
    irs = jnp.asarray(rng.standard_normal((batch, ir_len)) * 0.05, jnp.float32)
    st0 = jax.jit(_vmapped_push(cfg))(batched_state(cfg, batch), irs)
    base = jax.tree.map(np.asarray, st0)

    def make_state():
        return jax.tree.map(jnp.asarray, base)

    blocks = jnp.asarray(
        rng.standard_normal((scan_blocks, batch, pts)) * 0.1, jnp.float32)
    # per chunk: each channel's x window (nparts+K rows) + h ring, 2
    # planes each, read once per 8-output group
    floor = max(scan_blocks / K * batch * 4 * cfg.nparts * cfg.bins * 4
                / 3e12, 0.02e-6 * scan_blocks)
    per_scan = _time_chained_fori(
        partial(P.pconv_stream_batched_chunked, cfg, K=K), make_state,
        (blocks,), floor_s=floor, reps=3)
    per_block = per_scan / scan_blocks
    return batch * (pts / SR) / per_block


def bench_fft_sweep(passes=3, sizes=(10, 12, 14, 16, 18, 20)):
    """Batched FFT GFLOP/s (5 N log2 N convention), 2^10..2^20.

    Same multi-window policy as the headline and serving metrics: the
    whole size loop runs `passes` times (each pass lands in a different
    relay-drift window since one pass takes minutes) and each size
    publishes the MEDIAN across its per-pass floor-guarded medians, with
    the spread alongside — one lucky/unlucky window must not set the
    published number."""
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.ops.fft import fft_split
    from opencl_fft_tpu.utils.profiling import median_chain_delta

    rng = np.random.default_rng(1)
    runners = {}
    for logn in sizes:
        n = 1 << logn
        batch = max(1, (32 << 20) // (8 * n))      # ~32MB working set
        re = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

        @partial(jax.jit, static_argnums=1)
        def run(x, iters, n=n):
            def body(i, x):
                # auto: four-step mm everywhere except the sizes the
                # measured table routes to the VMEM kernel (ops/fft.py
                # _VMEM_AUTO_SIZES — 2^18 via the transposed-L2 variant
                # after the r3 race). The chain normalization rides the
                # fused scale epilogue — outside the kernel it would
                # cost an extra HBM pass per iteration that the mm path
                # fuses but pallas cannot.
                return fft_split(x, -1, "auto", scale=1.0 / np.sqrt(n))
            return jax.lax.fori_loop(0, iters, body, x)

        # Chain length: keep every chain >= ~50 ms of device work. The
        # estimator divides host-clock chain-delta jitter (relay sync
        # noise, ~ms) by `reps`; the r2 setting (iters=50/25 at the big
        # sizes => 9-19 ms chains) let that jitter contribute 30%+ of
        # the published number, which is why 2^16-2^20 medians sat far
        # below their interleaved-A/B mins while the 200-iter small
        # sizes tracked theirs.
        iters = 200
        _sync(run((re, im), 1))
        _sync(run((re, im), iters))

        def timed(k, run=run, re=re, im=im):
            t0 = time.time(); _sync(run((re, im), k)); return time.time() - t0

        runners[logn] = (timed, batch, iters)

    samples = {logn: [] for logn in runners}
    for p in range(passes):
        for logn, (timed, batch, iters) in runners.items():
            n = 1 << logn
            # physical floor: each iteration moves >= 2x the split-complex
            # working set through HBM (generous 3 TB/s => only impossible
            # numbers are rejected).
            floor = batch * n * 8 * 2 / 3e12
            dt, _nv = median_chain_delta(timed, iters - 1, floor)
            if dt is not None:
                samples[logn].append(dt)

    results = {}
    for logn, (timed, batch, iters) in runners.items():
        n = 1 << logn
        ds = sorted(samples[logn])
        if not ds:
            print(f"  fft 2^{logn}: unmeasurable in all {passes} windows, "
                  f"omitted", file=sys.stderr)
            continue
        dt = ds[(len(ds) - 1) // 2]
        gf = lambda d: 5 * n * logn * batch / d / 1e9
        results[f"2^{logn}"] = {
            "batch": batch, "us": round(dt * 1e6, 1),
            "gflops": round(gf(dt), 1),
            "gflops_spread": {"min": round(gf(ds[-1]), 1),
                              "median": round(gf(dt), 1),
                              "max": round(gf(ds[0]), 1),
                              "windows": len(ds)},
        }
        print(f"  fft 2^{logn} batch={batch}: {dt*1e6:9.1f} us "
              f"{gf(dt):8.1f} GFLOP/s (spread {gf(ds[-1]):.0f}/"
              f"{gf(dt):.0f}/{gf(ds[0]):.0f} over {len(ds)})",
              file=sys.stderr)
    return results


def _measure_multiwindow(details, metrics, passes=3):
    """Measure every secondary metric `passes` times, ROUND-ROBIN (one
    full pass over all metrics per relay-drift window, ~10 min apart by
    construction), publishing each metric's MEDIAN with the full
    min/median/max spread alongside.

    Why round-robin instead of per-metric repeats: (a) the relay drifts
    2-3x on ~10-minute timescales, so back-to-back repeats of one metric
    share a window and a single bad window still owns its median; (b)
    paired comparisons (bf16 vs f32 rings, chunked vs plain) land in the
    SAME window each pass, which is the only drift-robust way to compare
    them (CLAUDE.md: only interleaved A/Bs are meaningful).

    metrics: {key: (fn, fmt)}. Omits LOUDLY when all windows fail."""
    samples = {k: [] for k in metrics}
    for p in range(passes):
        for key, (fn, _fmt) in metrics.items():
            t0 = time.time()
            try:
                samples[key].append(fn())
                print(f"  pass {p} {key}: {samples[key][-1]:.1f} "
                      f"({time.time() - t0:.0f}s)", file=sys.stderr,
                      flush=True)
            except Unmeasurable as e:
                print(f"  pass {p} {key}: {e}", file=sys.stderr, flush=True)
            except Exception as e:
                print(f"  pass {p} {key}: FAILED ({str(e)[:160]})",
                      file=sys.stderr, flush=True)
    for key, (_fn, fmt) in metrics.items():
        vals = sorted(samples[key])
        if not vals:
            print(f"OMITTED {key}: unmeasurable in all {passes} windows",
                  file=sys.stderr)
            continue
        med = vals[(len(vals) - 1) // 2]
        details[key] = round(med, 1)
        details[key + "_spread"] = {
            "min": round(vals[0], 1), "median": round(med, 1),
            "max": round(vals[-1], 1), "windows": len(vals)}
        print(fmt.format(med)
              + f" (spread {vals[0]:.0f}/{med:.0f}/{vals[-1]:.0f} "
              f"over {len(vals)} windows)", file=sys.stderr)


def _probe_device(timeout_s: int = 180) -> bool:
    """The relay tunnel can die or wedge (observed: a jumbo remote compile
    left even jax.devices() hanging indefinitely). Probe it in a
    subprocess with a hard timeout so the bench emits an honest failure
    line instead of hanging the driver."""
    import os
    import subprocess
    env = dict(os.environ)
    site = os.path.dirname(os.path.dirname(np.__file__))
    env["PYTHONPATH"] = os.pathsep.join(
        [site] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "x = jnp.ones((8, 128)); float(jnp.sum(x * x))"],
            timeout=timeout_s, capture_output=True, env=env)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _probe_with_retry(horizon_s: float = 900.0) -> bool:
    """Relay outages are often transient (tunnel restart, a draining jumbo
    compile). Instead of giving up on the first failed probe — which cost
    round 3 its only driver-verified number — re-probe with backoff for up
    to `horizon_s` seconds, logging every attempt, before emitting the
    honest failure JSON."""
    deadline = time.time() + horizon_s
    delay = 30.0
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        if _probe_device():
            if attempt > 1:
                print(f"probe attempt {attempt}: device reachable after "
                      f"{time.time() - (deadline - horizon_s):.0f}s of "
                      "outage", file=sys.stderr)
            return True
        remaining = deadline - time.time()
        print(f"probe attempt {attempt} failed after {time.time()-t0:.0f}s; "
              f"{max(0.0, remaining):.0f}s left in retry horizon",
              file=sys.stderr)
        if remaining <= 0:
            return False
        time.sleep(min(delay, max(1.0, remaining)))
        delay = min(delay * 1.5, 120.0)


def main():
    if not _probe_with_retry():
        print("DEVICE UNREACHABLE: the TPU relay did not answer a trivial "
              "op within the probe retry horizon; no measurement is "
              "possible in this environment right now.", file=sys.stderr)
        print(json.dumps({
            "metric": "pconv_realtime_factor_2^17tap_512pts",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": "device unreachable (relay dead/wedged)",
        }))
        raise SystemExit(1)

    details = {}

    # multiple full estimates across relay-drift windows; each attempt
    # is already a floor-guarded median_chain_delta. The headline is the
    # MEDIAN window (publishing the max would be drift-selection); the
    # full min/median/max spread rides alongside so no number rests on a
    # single drift window.
    attempts = []
    for attempt in range(3):
        try:
            attempts.append(bench_pconv_rt())
        except Unmeasurable as e:
            print(f"headline attempt {attempt}: {e}", file=sys.stderr)
    if not attempts:
        raise SystemExit("headline metric unmeasurable after 3 attempts")
    attempts.sort(key=lambda t: t[0])
    # lower-middle on even counts: if one window failed, publishing
    # attempts[1] of 2 would be the max — drift-selection again
    rtf, per_block = attempts[(len(attempts) - 1) // 2]
    details["pconv_rt_factor_2^17_512"] = round(rtf, 1)
    details["pconv_us_per_block"] = round(per_block * 1e6, 1)
    details["pconv_rt_factor_spread"] = {
        "min": round(attempts[0][0], 1),
        "median": round(rtf, 1),
        "max": round(attempts[-1][0], 1),
        "windows": len(attempts),
    }
    print(f"pconv 2^17-tap @512: {rtf:.1f}x real time "
          f"({per_block*1e6:.0f} us/block; spread "
          f"{attempts[0][0]:.0f}/{rtf:.0f}/"
          f"{attempts[-1][0]:.0f}x over {len(attempts)} windows)",
          file=sys.stderr)

    # every secondary metric gets the same multi-window median+spread
    # treatment as the headline (VERDICT r4 #1: tvconv swung 3x between
    # the one driver window and the README window; nobody could tell
    # slow from unlucky). Round-robin passes also put the bf16-vs-f32
    # and chunked-vs-plain pairs in the SAME drift window each pass.
    _measure_multiwindow(details, {
        "tvconv_rt_factor_2^17_512": (
            lambda: bench_pconv_rt(tv=True)[0],
            "tvconv 2^17-tap @512: {:.1f}x real time"),
        "dconv_rt_factor_512tap": (
            bench_dconv, "dconv 512-tap: {:.1f}x real time"),
        "serving_64ch_audio_seconds_per_second": (
            bench_batched_serving,
            "serving 64ch 2^17-tap: {:.0f} aggregate audio-s/s"),
        "serving_64ch_bf16_audio_seconds_per_second": (
            lambda: bench_batched_serving(ring_dtype="bf16"),
            "serving 64ch bf16 rings (~1e-3 err): {:.0f} "
            "aggregate audio-s/s"),
        "serving_64ch_chunk8_audio_seconds_per_second": (
            bench_batched_serving_chunked,
            "serving 64ch chunked K=8 (85 ms latency): {:.0f} "
            "aggregate audio-s/s"),
        "pconv_offline_rt_factor": (
            bench_pconv_offline, "pconv offline render: {:.0f}x real time"),
        "serving_offline_16ch_audio_seconds_per_second": (
            bench_serving_offline,
            "serving-offline 16ch: {:.0f} aggregate audio-s/s"),
        "pconv_chunk8_rt_factor": (
            bench_pconv_chunk, "pconv chunked K=8: {:.1f}x real time"),
        "pconv_chunk8_bf16_rt_factor": (
            lambda: bench_pconv_chunk(ring_dtype="bf16"),
            "pconv chunked K=8 bf16: {:.1f}x real time"),
    })

    details["fft_sweep"] = bench_fft_sweep()

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    # evidence hygiene (VERDICT r4 #6a): regenerate README's perf block
    # from the artifact just written, so `tools/readme_perf.py --check`
    # can never fail at snapshot+capture time
    try:
        import importlib.util as _ilu
        _rp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tools", "readme_perf.py")
        _spec = _ilu.spec_from_file_location("readme_perf", _rp)
        _mod = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_mod)
        _mod.main([])
    except Exception as e:
        print(f"warning: README perf re-render failed: {e!r}",
              file=sys.stderr)

    # Headline line for the driver (target: >100x real time, BASELINE.md)
    print(json.dumps({
        "metric": "pconv_realtime_factor_2^17tap_512pts",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
