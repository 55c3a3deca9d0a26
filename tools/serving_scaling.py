"""Serving-scale curve: aggregate throughput vs channel count.

Measures the batched LTI convolver (models/convolver.py) at batch sizes
1..128 on the visible chip — the "convolution-reverb farm" deployment
shape. Writes bench_results/serving_scaling.json.

Run:  python tools/serving_scaling.py
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np

SR = 48000.0


def measure(batch: int, pts: int = 512, ir_len: int = 1 << 17,
            scan_blocks: int = 1880) -> dict:
    import jax
    import jax.numpy as jnp
    from opencl_fft_tpu.models.convolver import (_vmapped, _vmapped_push,
                                                 batched_state)
    from opencl_fft_tpu.ops import pconv as P

    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    rng = np.random.default_rng(3)
    irs = jnp.asarray(rng.standard_normal((batch, ir_len)) * 0.05, jnp.float32)
    base = jax.tree.map(np.asarray,
                        jax.jit(_vmapped_push(cfg))(batched_state(cfg, batch), irs))

    step = _vmapped(P.pconv_step, cfg)

    # scan unroll amortizes the ~15us/iter backend loop overhead, which
    # only matters while the per-block work is tiny; at wide batches the
    # x4 program bloat hurts scheduling (measured: batch=64 ran 1.07ms/
    # block unrolled vs ~0.25ms in bench.py's unroll-free program)
    unroll = 4 if batch < 16 else 1

    def stream(st, blocks):
        return jax.lax.scan(lambda s, b: step(s, b), st, blocks,
                            unroll=unroll)

    blocks = jnp.asarray(rng.standard_normal((scan_blocks, batch, pts)) * 0.1,
                         jnp.float32)
    fn = jax.jit(stream, donate_argnums=(0,))

    def mk():
        return jax.tree.map(jnp.asarray, base)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0][..., :1]))

    st, out = fn(mk(), blocks)
    sync(out)

    def run(n):
        st = mk()                      # one state transfer per run,
        t0 = time.time()               # cancelled by the long-short delta
        out = None
        for _ in range(n):
            st, out = fn(st, blocks)
        sync(out)
        return time.time() - t0

    # physical floor: the batched MAC streams batch x 4 ring planes of
    # (nparts, bins) f32 per block; 3 TB/s is ~5x the chip's HBM so only
    # impossible (drift-collapsed) deltas are rejected. Estimator:
    # utils.profiling.median_chain_delta (the shared convention).
    from opencl_fft_tpu.utils.profiling import median_chain_delta

    floor_block = max(batch * 4 * cfg.nparts * cfg.bins * 4 / 3e12, 1e-6)
    delta, _n = median_chain_delta(run, 3, floor_block * scan_blocks)
    if delta is None:
        return {"unmeasurable": True}
    best = delta / scan_blocks
    per_ch_rtf = (pts / SR) / best
    return {
        "us_per_block_all_channels": round(best * 1e6, 1),
        "per_channel_rt_factor": round(per_ch_rtf, 1),
        "aggregate_audio_s_per_s": round(batch * per_ch_rtf, 1),
    }


def main():
    results = {}
    for batch in [1, 4, 16, 64, 128]:
        r = measure(batch)
        if r.get("unmeasurable"):
            print(f"batch={batch:4d}: unmeasurable (relay glitch), omitted",
                  file=sys.stderr, flush=True)
            continue
        results[f"batch={batch}"] = r
        print(f"batch={batch:4d}: {r['us_per_block_all_channels']:8.1f} us/blk "
              f"{r['per_channel_rt_factor']:8.1f}x/ch "
              f"{r['aggregate_audio_s_per_s']:9.1f} agg audio-s/s",
              file=sys.stderr, flush=True)
    with open("bench_results/serving_scaling.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote bench_results/serving_scaling.json", file=sys.stderr)


if __name__ == "__main__":
    main()
