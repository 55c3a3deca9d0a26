"""Audio-host binding demo: a PortAudio-convention callback driving the
convolution engine (the analog of loading the reference's opcodes into
a live Csound engine, csound/opcode.cpp:347-352).

Opens the best available host — a real duplex sounddevice/PortAudio
stream when the package is installed, else the wall-clock-paced
VirtualHost (same callback contract) — and runs a synthetic source
through a 2^17-tap reverb for a few seconds, reporting the real-time
health metrics (underruns / overruns / late callbacks).

Run:  python examples/audio_host_demo.py [seconds] [pts]
      (defaults: 3 seconds, pts=4096)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from opencl_fft_tpu.ops import pconv as P
from opencl_fft_tpu.runtime.hosts import (PipelineCallback, VirtualHost,
                                          open_host)
from opencl_fft_tpu.runtime.pipeline import RealtimePipeline

SR = 48000


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    ir_len = 1 << 17
    rng = np.random.default_rng(0)
    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    ir = (rng.standard_normal(ir_len) *
          np.exp(-np.arange(ir_len) / (0.3 * SR))).astype(np.float32)

    t = np.arange(int(seconds * SR) + pts, dtype=np.float32) / SR
    melody = (0.3 * np.sin(2 * np.pi * 220 * t)
              * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))).astype(np.float32)
    pos = [0]

    def source(n):
        s = melody[pos[0]:pos[0] + n]
        pos[0] += n
        return s if s.size == n else np.zeros(n, np.float32)

    with RealtimePipeline(cfg, ir=ir, prime_blocks=4,
                          capacity_blocks=16) as pipe:
        pipe.push(np.zeros(pts, np.float32))
        pipe.wait_for_blocks(1, timeout=600)    # jit warm-up off the clock
        cb = PipelineCallback(pipe)
        host = open_host(cb, sr=SR, frames=pts, source=source)
        kind = type(host).__name__
        print(f"host: {kind}; pts={pts}, IR {ir_len} taps "
              f"({cfg.nparts} partitions), {seconds:.1f}s")
        with host:
            time.sleep(seconds)
        print(f"callbacks: {cb.callbacks}; underrun samples: "
              f"{pipe.underrun_samples}; overrun samples: "
              f"{pipe.overrun_samples}"
              + (f"; late callbacks: {host.late_callbacks}"
                 if isinstance(host, VirtualHost) else ""))
        ok = pipe.underrun_samples == 0
        print("REALTIME OK" if ok else "UNDERRUNS — raise prime_blocks "
              "or pts for this device")
        return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
