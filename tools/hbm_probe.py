"""De-noised HBM copy roofline: time a pure HBM-bound copy chain with
the r5 methodology (one-dispatch fori chains, no per-call uploads).

The historical "~600 GB/s measured" figure came from pure-copy probes
whose readings included relay dispatch congestion; r5 FFT medians
imply >= ~694 GB/s sustained (BASELINE.md footnote). This tool pins the
honest number: y = x * 1.000001 over a 33.5 MB plane, chained in a
fori_loop (one read + one write per iteration), median of floor-guarded
deltas across 3 windows.

Usage: python tools/hbm_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from opencl_fft_tpu.utils.profiling import median_chain_delta

    # must NOT fit VMEM (128 MB on v5e): a 32 MB plane stayed resident
    # and the first probe run measured pure VMEM traffic (all deltas
    # under the HBM floor). 256 MB forces true HBM streaming.
    n_bytes = 256 << 20
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(n_bytes // 4), jnp.float32)

    @partial(jax.jit, static_argnums=1)
    def run(x, k):
        # multiply by a non-1 constant: a pure copy could be elided or
        # aliased; the scale forces one read + one write per iteration
        return jax.lax.fori_loop(0, k, lambda i, x: x * jnp.float32(
            1.0000001), x)

    float(jnp.sum(run(x, 1)[:1]))
    float(jnp.sum(run(x, 100)[:1]))

    def timed(k):
        t0 = time.time()
        float(jnp.sum(run(x, k)[:1]))
        return time.time() - t0

    results = []
    for w in range(3):
        dt, nv = median_chain_delta(timed, 99, 2 * n_bytes / 3e12,
                                    min_chain_s=0.05)
        if dt is not None:
            gbs = 2 * n_bytes / dt / 1e9
            results.append(round(gbs, 1))
            print(f"  window {w}: {dt*1e6:.1f} us/pass = {gbs:.0f} GB/s",
                  file=sys.stderr, flush=True)
    out = {"bytes_per_pass": 2 * n_bytes, "windows_gbs": results,
           "median_gbs": (sorted(results)[(len(results) - 1) // 2]
                          if results else None)}
    path = os.path.join(ROOT, "bench_results", "hbm_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
