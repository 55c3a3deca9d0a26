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
    while pipe.blocks_processed < 1:       # jit warm-up outside the clock
        time.sleep(1e-3)
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
    while pipe.blocks_processed < 1:
        time.sleep(1e-3)
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
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
