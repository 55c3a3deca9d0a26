"""Tuned four-step split table (measured on the target chip). n -> left
factor n1; 0 means a direct dense leaf.

r3 re-measurement (tools/autotune_fft.py methodology; raw numbers in
bench_results/fft_plan_sweep.json): the r2 table was tuned in a slow
relay window with a weaker estimator and left 2-3x on the table at
several sizes — e.g. 2^12: n1=64 measured 168 us vs 398 us at the old
n1=256; 2^18: n1=128 measured 461 us vs 589 us at n1=1024; 2^16:
n1=128 measured 203 us vs 432 us at n1=256. n1=128 (the MXU edge) wins
every size >= 2^14: XLA fuses the balanced recursion into few HBM
passes. Within-window plan rankings are the signal; absolute GF/s drift
2-3x between relay windows.
"""

PLANS = {
    256: 32,
    512: 8,
    1024: 64,
    2048: 16,
    4096: 64,
    8192: 64,
    16384: 128,
    32768: 256,
    65536: 256,   # balanced dense x dense (b256): won 3/4 interleaved
    #               rounds vs the 128-rooted tree (344.2 vs 373.1 us,
    #               tools/fft_plan16.py r3; needs PLANS_INNER[256] = 0)
    131072: 128,
    262144: 128,
    524288: 128,
    1048576: 128,
}

# Non-root factors inside a larger four-step tree (fft._INNER_OVERRIDES;
# see _plan_lookup). 256 as an inner node goes DENSE — this is what makes
# the 2^16 balanced 256x256 tree two matmul levels deep (the win above).
# Standalone 256-point transforms keep PLANS[256].
PLANS_INNER = {
    256: 0,
}
