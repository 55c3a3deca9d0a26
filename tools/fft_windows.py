"""FFT throughput across relay-drift windows.

The relay in front of the chip drifts 2-3x on ~10-minute timescales, so a
single bench.py sweep under- or over-states FFT throughput by the window
it lands in. This tool runs the same measurement (bench.bench_fft_sweep,
auto dispatch: mm / VMEM Pallas kernel per the measured policy) in W
spaced windows and writes per-size {min, median, max} GFLOP/s to
bench_results/fft_sweep_windows.json — the honest range, with the
in-window kernel-vs-mm rankings living in bench_results/vmemfft_ab.json.

Run:  python tools/fft_windows.py [windows] [spacing_s]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench


def main():
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spacing = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    per_size: dict = {}
    for w in range(windows):
        t0 = time.time()
        print(f"-- window {w} --", file=sys.stderr, flush=True)
        res = bench.bench_fft_sweep()
        for size, row in res.items():
            per_size.setdefault(size, []).append(row["gflops"])
        if w + 1 < windows:
            time.sleep(max(0.0, spacing - (time.time() - t0)))
    out = {
        size: {
            "windows": len(v),
            "min_gflops": min(v),
            "median_gflops": round(float(np.median(v)), 1),
            "max_gflops": max(v),
        }
        for size, v in per_size.items()
    }
    with open("bench_results/fft_sweep_windows.json", "w") as f:
        json.dump(out, f, indent=2)
    for size, row in out.items():
        print(f"{size}: {row['min_gflops']}..{row['max_gflops']} "
              f"(median {row['median_gflops']}) GFLOP/s over "
              f"{row['windows']} windows", file=sys.stderr, flush=True)
    print("wrote bench_results/fft_sweep_windows.json", file=sys.stderr)


if __name__ == "__main__":
    main()
