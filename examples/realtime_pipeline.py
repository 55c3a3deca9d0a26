"""Real-time pipeline demo — audio callback <-> SPSC rings <-> device worker.

The analog of running the reference's `clconv` opcode inside Csound's
real-time engine (csound/opcode.cpp:229-252), but with the device worker
decoupled from the audio thread by the native lock-free rings, so device
dispatch latency never blocks the callback.

Phase 1 measures the unpaced sustained throughput of the full pipeline
(rings + worker + device round trips per block — NOT the batched-scan
throughput bench.py reports; per-block round trips through this
environment's TPU relay cost ~ms each).
Phase 2 runs a wall-clock-paced 48 kHz duplex callback for a few seconds
and reports underruns/overruns (the real-time health metrics).
Phase 3 swaps in the zero-added-latency engine through ProcessorPipeline
(ClconvProcessor(parts=0) behind the same rings): the paced stream then
carries NO algorithmic partition delay — only the priming budget.

Run:  python examples/realtime_pipeline.py [pts] [seconds]
      (defaults: pts=4096, 3 seconds, 2^17-tap IR)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from opencl_fft_tpu.ops import pconv as P
from opencl_fft_tpu.runtime.pipeline import RealtimePipeline

SR = 48000.0


def main():
    pts = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    ir_len = 1 << 17
    rng = np.random.default_rng(0)

    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    ir = (rng.standard_normal(ir_len) *
          np.exp(-np.arange(ir_len) / (0.3 * SR))).astype(np.float32)

    import jax
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); "
          f"pts={pts}, IR {ir_len} taps ({cfg.nparts} partitions)")

    # ---- phase 1: unpaced sustained throughput --------------------------
    nblocks = max(64, int(seconds * SR / pts))
    blocks = rng.standard_normal((nblocks, pts)).astype(np.float32) * 0.1
    pipe = RealtimePipeline(cfg, ir=ir, prime_blocks=4,
                            capacity_blocks=16).start()
    pipe.push(blocks[0])
    pipe.wait_for_blocks(1, timeout=600)   # jit warm-up outside the clock
    t0 = time.monotonic()
    fed = 1
    pulled = 0
    while pipe.blocks_processed < nblocks:
        if fed < nblocks:
            fed += int(pipe.push(blocks[fed]) > 0)
        pulled += pipe.pull_available() and pipe.pull(pts).size
        time.sleep(1e-4)
    dt = time.monotonic() - t0
    rt = (nblocks - 1) * pts / SR / dt
    print(f"phase 1 (unpaced): {nblocks} blocks in {dt:.2f}s -> "
          f"{rt:.1f}x real time per-block round-trip")
    pipe.stop()

    # ---- phase 2: paced 48 kHz duplex callback --------------------------
    pipe = RealtimePipeline(cfg, ir=ir, prime_blocks=4,
                            capacity_blocks=16).start()
    pipe.push(blocks[0])
    pipe.wait_for_blocks(1, timeout=600)
    period = pts / SR
    nxt = time.monotonic()
    peak = 0.0
    for i in range(1, nblocks):
        nxt += period
        while time.monotonic() < nxt:
            time.sleep(period / 100)
        pipe.push(blocks[i])
        out = pipe.pull(pts)
        peak = max(peak, float(np.max(np.abs(out))))
    pipe.stop()
    ok = pipe.underrun_samples == 0 and pipe.overrun_samples == 0
    print(f"phase 2 (paced @48kHz): {nblocks - 1} callbacks, "
          f"underruns={pipe.underrun_samples} overruns={pipe.overrun_samples} "
          f"peak={peak:.3f} -> {'REALTIME OK' if ok else 'NOT KEEPING UP'}")

    # ---- phase 3: zero-added-latency engine behind the same rings -------
    # Per-block host round trips dominate here (the relay costs ~30 ms
    # per sync), so first measure the UNPACED sustained rate, then pace a
    # real callback only if the budget fits — the algorithmic-latency
    # claim (0 samples vs pts for phases 1-2) holds either way.
    from opencl_fft_tpu.runtime.pipeline import ProcessorPipeline
    from opencl_fft_tpu.stream import ClconvProcessor

    bs = 2048                                 # I/O granularity, not latency
    nblk3 = max(16, int(min(seconds, 1.5) * SR / bs))
    blocks3 = rng.standard_normal((nblk3, bs)).astype(np.float32) * 0.1
    proc = ClconvProcessor(ir, parts=0, block_size=bs, pmax=8192)
    zpipe = ProcessorPipeline(proc, bs, prime_blocks=4,
                              capacity_blocks=64).start()
    zpipe.push(blocks3[0])
    zpipe.wait_for_blocks(1, timeout=600)     # jit warm-up off the clock
    t0 = time.monotonic()
    fed = 1
    while zpipe.blocks_processed < nblk3:
        if fed < nblk3:
            fed += int(zpipe.push(blocks3[fed]) > 0)
        if zpipe.pull_available():
            zpipe.pull(bs)
        time.sleep(1e-4)
    rt3 = (nblk3 - 1) * bs / SR / (time.monotonic() - t0)
    zpipe.stop()
    print(f"phase 3 (zero-latency engine, {bs}-sample blocks, "
          f"{len(proc._engine.segments)} segments): algorithmic latency "
          f"0 samples (vs {pts} in phases 1-2), unpaced {rt3:.2f}x real "
          f"time{'' if rt3 >= 1.2 else ' — per-block sync floor of this'}"
          f"{'' if rt3 >= 1.2 else ' environment; throughput is phase 1'}")

    if rt3 >= 1.2:                            # budget fits: pace it for real
        proc3 = ClconvProcessor(ir, parts=0, block_size=bs, pmax=8192)
        zpipe = ProcessorPipeline(proc3, bs, prime_blocks=4,
                                  capacity_blocks=64).start()
        zpipe.push(blocks3[0])
        zpipe.wait_for_blocks(1, timeout=600)
        period3 = bs / SR
        nxt = time.monotonic()
        for i in range(1, nblk3):
            nxt += period3
            while time.monotonic() < nxt:
                time.sleep(period3 / 100)
            zpipe.push(blocks3[i])
            zpipe.pull(bs)
        zpipe.stop()
        ok3 = zpipe.underrun_samples == 0 and zpipe.overrun_samples == 0
        print(f"phase 3 (paced @48kHz): {nblk3 - 1} callbacks, "
              f"underruns={zpipe.underrun_samples} "
              f"overruns={zpipe.overrun_samples} -> "
              f"{'REALTIME OK' if ok3 else 'NOT KEEPING UP'}")
    else:
        print("phase 3 paced callback skipped: unpaced rate below the "
              "1.2x budget (per-block relay sync floor)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
