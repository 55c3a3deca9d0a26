"""Run examples/clconv.csd with the framework's processors ON the Csound
bus (engine-resident inserts; see opencl_fft_tpu.runtime.csound_host).

Requires a Csound installation + the ctcsound bindings; exits with a
clear message when they are absent (every other surface of the framework
works without them).

Usage: python examples/csound_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from opencl_fft_tpu.runtime import csound_host as ch  # noqa: E402


def main() -> int:
    if not ch.available():
        print("ctcsound is not importable — install Csound + ctcsound to "
              "run the engine-resident demo. The same signal path runs "
              "headlessly in tests/test_csound_workload.py.")
        return 1
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "clconv.csd")) as f:
        csd = f.read()
    rng = np.random.default_rng(0)
    ir = (rng.standard_normal(16384) *
          np.exp(-np.arange(16384) / 4000.0)).astype(np.float32)
    inserts = [
        ch.clconv_insert(ir, parts=2048, block_size=64),
        ch.cltvconv_insert(parts=2048, size=16384, block_size=64),
    ]
    host = ch.CsoundHost(csd, inserts)
    cycles = host.run()
    print(f"performed {cycles} ksmps cycles with "
          f"{len(inserts)} engine-resident inserts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
