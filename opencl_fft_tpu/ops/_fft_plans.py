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

# Gauss 3-matmul leaf threshold per ROOT size (fft._GAUSS_BY_ROOT):
# leaves >= the threshold inside that root's tree use the 3-matmul Gauss
# complex product (25% fewer MXU FLOPs) instead of the one-block-matmul
# form. Measured interleaved (tools/fft_gauss_ab.py ->
# bench_results/fft_gauss_ab.json): decisive at 2^16 (317.9 -> 228.6 us,
# 3/3 rounds) and 2^18 (382.7 -> 294.9 us, 3/3) where the dense
# 256/128-leaves are MXU-bound under bf16x3; 2/3 at 2^14 (160.6 ->
# 157.5); 2^12 and 2^20 keep the block form (HBM-bound: smaller leaves /
# batch-4 working set).
# r5 per-LEVEL refinement at 2^16 (tools/fft_plan16.py --only
# cur,cur_g,cur_gl,cur_gr, 3/3 rounds, bench_results/fft_plan16_race
# .json): Gauss on ONLY the second (out_t) 256-leaf of the balanced
# tree — (g1, g2) tuple, g applied where leaf >= g — beats Gauss-on-
# both by ~7% (209.7 vs 224.3 us best) and plain by ~18% (255.5).
# The L1 axis-(-2) leaf loses MXU efficiency under the Gauss split
# (three narrower dots on the strided contraction) while the out_t
# L2 leaf keeps it.
GAUSS = {
    16384: 64,
    65536: (1 << 30, 64),
    262144: 64,
}

# Non-root factors inside a larger four-step tree (fft._INNER_OVERRIDES;
# see _plan_lookup). 256 as an inner node goes DENSE — this is what makes
# the 2^16 balanced 256x256 tree two matmul levels deep (the win above).
# Standalone 256-point transforms keep PLANS[256].
PLANS_INNER = {
    256: 0,
}
