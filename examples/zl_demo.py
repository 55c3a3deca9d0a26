"""Zero-added-latency convolution demo.

Runs the same reverb workload as `examples/demo.py` through
`models.ZeroLatencyConvolver` (non-uniform Gardner partitioning:
direct-FIR head + doubling partition sizes) and verifies the defining
property live: the streamed output is sample-aligned with the offline
convolution, where the reference's streaming layer always pays one full
partition of latency (`/root/reference/csound/opcode.cpp:240-249`).

The script measures the alignment empirically — it streams a unit
impulse and locates the IR onset in the output — and prints the added
latency in samples for both the zero-latency engine (expected: 0) and
the uniform one-partition engine it replaces (expected: parts).

Run:  python examples/zl_demo.py [out.wav]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo import SR, synth_hall_ir, synth_source, write_wav

from opencl_fft_tpu.models import ZeroLatencyConvolver
from opencl_fft_tpu.stream import ClconvProcessor


def measured_latency(process, block: int, ir: np.ndarray, nblocks: int = 40
                     ) -> int:
    """Stream a unit impulse; return onset(output) - onset(ir)."""
    onset_ir = int(np.argmax(np.abs(ir) > 1e-6))
    out = []
    for b in range(nblocks):
        x = np.zeros(block, np.float32)
        if b == 0:
            x[0] = 1.0
        out.append(np.asarray(process(x)))
    y = np.concatenate(out)
    onset_y = int(np.argmax(np.abs(y) > 1e-6))
    return onset_y - onset_ir


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "zl_demo.wav"
    rng = np.random.default_rng(2024)
    dry = synth_source(rng)
    ir = synth_hall_ir(1.5, rng)
    block = 64

    # latency head-to-head on a unit impulse (fresh engines)
    zl_probe = ZeroLatencyConvolver(ir, block=block)
    uni_probe = ClconvProcessor(ir, parts=1024)
    lat_zl = measured_latency(zl_probe.process, block, ir)
    lat_uni = measured_latency(uni_probe.process, block, ir)
    print(f"measured added latency: zero-latency engine = {lat_zl} samples, "
          f"uniform parts=1024 engine = {lat_uni} samples")
    assert lat_zl == 0, f"zero-latency engine added {lat_zl} samples"

    # the reverb workload, streamed block-by-block like an audio host
    zl = ZeroLatencyConvolver(ir, block=block)
    pad = np.zeros((-dry.size) % block, np.float32)
    stream = np.concatenate([dry, pad, np.zeros(ir.size + 1024, np.float32)])
    stream = stream[: stream.size - stream.size % block]
    wet = np.concatenate([
        zl.process(stream[i: i + block])
        for i in range(0, stream.size, block)
    ])

    mix = 0.7 * np.pad(dry, (0, wet.size - dry.size)) + 0.6 * wet
    write_wav(out_path, mix / max(1.0, np.max(np.abs(mix))))
    nseg = len(zl.segments)
    print(f"wrote {out_path}: {wet.size / SR:.1f}s, IR {ir.size} taps, "
          f"block={block}, head+{nseg} segments "
          f"(pts {[s.pts for s in zl.segments]})")


if __name__ == "__main__":
    main()
