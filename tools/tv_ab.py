"""Interleaved TV-vs-LTI A/B at the headline config (VERDICT r4 #1).

The r4 driver window measured tvconv 1207x vs pconv 3272x while the
README (builder-window) block said 3541x for the identical TV config —
a 3x swing that makes the single-window TV number meaningless. Relay
drift is only cancelled by interleaving (CLAUDE.md), so this tool
alternates full floor-guarded measurements of the two engines
A,B,A,B,... at ~1-minute granularity (well inside the ~10-minute drift
timescale) and reports per-pair ratios plus per-arm medians.

Usage: python tools/tv_ab.py [--pairs 4] [--pts 512] [--logl 17]
Writes bench_results/tv_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (the repo-root driver; reuses its floors)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--pts", type=int, default=512)
    ap.add_argument("--logl", type=int, default=17)
    args = ap.parse_args()

    ir_len = 1 << args.logl
    pairs = []
    for i in range(args.pairs):
        row = {}
        for tag, tv in (("lti", False), ("tv", True)):
            try:
                rtf, per_block = bench.bench_pconv_rt(
                    pts=args.pts, ir_len=ir_len, tv=tv)
                row[tag] = {"rt": round(rtf, 1),
                            "us_per_block": round(per_block * 1e6, 2)}
            except bench.Unmeasurable as e:
                row[tag] = {"error": str(e)}
            print(f"  pair {i} {tag}: {row[tag]}", file=sys.stderr,
                  flush=True)
        if "rt" in row.get("lti", {}) and "rt" in row.get("tv", {}):
            row["tv_over_lti"] = round(row["tv"]["rt"] / row["lti"]["rt"], 3)
        pairs.append(row)

    ratios = sorted(r["tv_over_lti"] for r in pairs if "tv_over_lti" in r)
    out = {
        "config": {"pts": args.pts, "ir_len": ir_len},
        "pairs": pairs,
        "ratio_median": ratios[(len(ratios) - 1) // 2] if ratios else None,
        "lti_median": sorted(r["lti"]["rt"] for r in pairs
                             if "rt" in r.get("lti", {}))[
            max(0, (sum("rt" in r.get("lti", {}) for r in pairs) - 1) // 2)]
        if any("rt" in r.get("lti", {}) for r in pairs) else None,
        "tv_median": sorted(r["tv"]["rt"] for r in pairs
                            if "rt" in r.get("tv", {}))[
            max(0, (sum("rt" in r.get("tv", {}) for r in pairs) - 1) // 2)]
        if any("rt" in r.get("tv", {}) for r in pairs) else None,
    }
    path = os.path.join(ROOT, "bench_results", "tv_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("ratio_median", "lti_median", "tv_median")}))
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
