"""Interleaved on-chip A/B: XLA block step vs the fused Pallas kernels.

For each streaming configuration, times the full per-block streaming scan
with pallas = "off" (XLA dynamic_slice + reduce + unpack), "block" (fused
MAC + bin0 + inverse pre-process kernel) and "on" (MAC-only kernel),
round-robin so every variant sees the same relay-drift window, min over
rounds. Writes the winners (and the measurements, as comments) into
``opencl_fft_tpu/ops/pallas/_tuned.py`` — the table ``pallas="auto"``
consults. Run on the target TPU:

    python tools/autotune_blockstep.py [--rounds 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from opencl_fft_tpu.ops import pconv as P
from opencl_fft_tpu.ops.pallas.blockstep import fits_vmem_blockstep
from opencl_fft_tpu.ops.pallas.mac import fits_vmem
from opencl_fft_tpu.ops.pallas.splitstep import fits_vmem_splitstep
from opencl_fft_tpu.ops.pallas.streamstep import fits_vmem_streamstep
from opencl_fft_tpu.utils.profiling import median_chain_delta

CONFIGS = [                     # (pts, ir_len): headline + the full
    (512, 1 << 17),             # benchmark-grid / serving shapes that
    (512, 1 << 16),             # pass the kernels' VMEM gates
    (512, 1 << 18),
    (512, 1 << 19),             # M=512 benchmark row, long-IR points:
    (512, 1 << 20),             # nparts 1024-4096 fit only the stream
    (512, 1 << 21),             # kernel's budget
    (256, 1 << 16),
    (256, 1 << 15),
    (1024, 1 << 17),
    (1024, 1 << 18),
    (2048, 1 << 18),
    (2048, 1 << 19),
    (2048, 1 << 16),            # M=2048 benchmark row: only the
    (2048, 1 << 17),            # half-table split kernel fits these
    (2048, 1 << 20),            # (tables 2*bins^2 vs the dense 6*bins^2)
    (128, 1 << 14),
]


def make_runner(pts, ir_len, mode, scan_blocks=512):
    cfg = P.PconvConfig.for_ir_length(ir_len, pts, pallas=mode)
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.standard_normal(ir_len), jnp.float32)
    base = jax.tree.map(np.asarray, P.push_ir(cfg, P.pconv_init(cfg), ir))
    blocks = jnp.asarray(rng.standard_normal((scan_blocks, pts)) * 0.1,
                         jnp.float32)
    fn = jax.jit(partial(P.pconv_stream, cfg), donate_argnums=(0,))

    def run(reps):
        st = jax.tree.map(jnp.asarray, base)
        t0 = time.time()
        out = None
        for _ in range(reps):
            st, out = fn(st, blocks)
        float(jnp.sum(out[..., :1]))
        return time.time() - t0

    run(1)                        # compile + warm
    return run, scan_blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated pts:log2L pairs (e.g. "
                         "'512:19,512:20') — tune only these and MERGE "
                         "into the existing table instead of replacing it")
    ap.add_argument("--floor-proof", type=str, default=None,
                    help="pts:log2L pairs whose XLA arm must NOT be "
                         "compiled (observed to wedge the relay, e.g. "
                         "512:21). Kernel arms are measured normally and "
                         "a kernel wins only if it beats the XLA path's "
                         "PHYSICAL floor (4 ring planes/block through a "
                         "5x-generous 3 TB/s HBM) — i.e. it beats any "
                         "physically possible XLA timing. Implies merge.")
    args = ap.parse_args()

    def parse_pairs(s):
        out = set()
        for tok in s.split(","):
            p, ll = tok.split(":")
            out.add((int(p), 1 << int(ll)))
        return out

    configs = CONFIGS
    merge_existing = False
    floor_proof = parse_pairs(args.floor_proof) if args.floor_proof else set()
    if args.only or floor_proof:
        want = parse_pairs(args.only) if args.only else set()
        want |= floor_proof
        configs = [c for c in CONFIGS if c in want] + sorted(
            want - set(CONFIGS))
        merge_existing = True

    results = {}
    loose_comments = []
    if merge_existing:
        import re as _re

        from opencl_fft_tpu.ops.pallas import _tuned
        # carry prior entries over with their measured-comment rows
        # intact, and keep standalone comment blocks (operational notes)
        # — regenerating the table must not erase the evidence it records
        prior_comments = {}
        in_winners = False
        for line in open("opencl_fft_tpu/ops/pallas/_tuned.py"):
            if line.startswith("WINNERS = {"):
                in_winners = True
                continue
            if in_winners and line.startswith("}"):
                in_winners = False
                continue
            if not in_winners:
                continue
            m = _re.match(r"\s*\((\d+), (\d+)\): '[a-z]+',\s*#\s*(.*)",
                          line)
            if m:
                prior_comments[(int(m.group(1)), int(m.group(2)))] = \
                    m.group(3).strip()
            elif line.strip().startswith("#"):
                loose_comments.append(line)
        for key, tag in _tuned.WINNERS.items():
            results[key] = (tag if tag != "xla" else "off",
                            prior_comments.get(key))
    for pts, ir_len in configs:
        nparts = ir_len // pts
        proof_only = (pts, ir_len) in floor_proof
        modes = [] if proof_only else ["off"]
        if fits_vmem_streamstep(nparts, pts):
            modes.append("stream")          # whole-scan grid kernel
        elif fits_vmem_splitstep(nparts, pts):
            modes.append("split")           # half-table whole-scan kernel
        if fits_vmem_blockstep(nparts, pts):
            modes.append("block")
            modes.append("blockf")          # fully fused (forward inside)
        elif fits_vmem(nparts, pts):
            # MAC-only kernel: measured strictly dominated by the fused
            # variants wherever both fit (r2 table), so it is only tuned
            # where it is the ONLY eligible kernel
            modes.append("on")
        if modes in ([], ["off"]):
            if proof_only:
                print(f"pts={pts} L=2^{int(np.log2(ir_len))}: no kernel "
                      f"arm fits VMEM — nothing to floor-prove",
                      file=sys.stderr, flush=True)
            continue
        try:
            runners = {m: make_runner(pts, ir_len, m) for m in modes}
        except Exception as e:                   # e.g. Mosaic vmem OOM
            print(f"pts={pts} L=2^{int(np.log2(ir_len))}: SKIPPED "
                  f"({str(e)[:120]})", file=sys.stderr, flush=True)
            continue
        # same estimator convention as bench.py: median of >= 2
        # independent floor-guarded deltas per round (a single delta is
        # corrupted BOTH ways by relay drift — an inflated short-chain
        # reading collapses it and min-keeping then ships a fake win),
        # min over interleaved rounds.
        nb = runners[modes[0]][1]
        floor = max(nb * 4 * nparts * pts * 4 / 3e12, 0.2e-6 * nb)
        # the whole-scan kernels' only per-block HBM traffic is the
        # block in/out — the MAC-plane floor would reject their
        # legitimate speed (applies to 'split' identically: its rings
        # are VMEM-resident too)
        floor_by_mode = {m: floor for m in modes}
        whole_scan_floor = max(nb * 2 * pts * 4 * 2 / 3e12, 0.02e-6 * nb)
        for m in ("stream", "split"):
            if m in floor_by_mode:
                floor_by_mode[m] = whole_scan_floor
        best = {m: float("inf") for m in modes}
        for _ in range(args.rounds):            # interleave over drift
            for m in modes:
                run, nb = runners[m]
                dt, _nv = median_chain_delta(run, args.reps,
                                             floor_by_mode[m], short=1,
                                             min_chain_s=0.05)
                if dt is not None:
                    best[m] = min(best[m], dt / nb)
        measured = {m: t for m, t in best.items() if t < float("inf")}
        if not measured:
            print(f"pts={pts} L=2^{int(np.log2(ir_len))}: all modes "
                  f"unmeasurable in this window, skipped",
                  file=sys.stderr, flush=True)
            continue
        row = {m: round(t * 1e6, 2) for m, t in measured.items()}
        winner = min(measured, key=measured.get)
        if proof_only:
            # XLA arm never compiled (relay-wedge risk): the kernel wins
            # only if it beats XLA's PHYSICAL per-block floor — 4 ring
            # planes through a 5x-generous 3 TB/s HBM — i.e. any
            # physically possible XLA timing.
            off_floor = max(4 * nparts * pts * 4 / 3e12, 0.2e-6)
            row["off_floor"] = round(off_floor * 1e6, 2)
            if measured[winner] >= off_floor:
                print(f"pts={pts} L=2^{int(np.log2(ir_len))}: best kernel "
                      f"{winner}={row[winner]}us does NOT beat the XLA "
                      f"physical floor {row['off_floor']}us — left "
                      f"unmeasured", file=sys.stderr, flush=True)
                continue
            results[(nparts, pts)] = (
                winner, dict(row, note="floor-proof: XLA arm not compiled"))
        else:
            results[(nparts, pts)] = (winner, row)
        print(f"pts={pts} L=2^{int(np.log2(ir_len))} (nparts={nparts}): "
              + "  ".join(f"{m}={row[m]}us" for m in row)
              + f"  -> {winner}", file=sys.stderr, flush=True)

    from opencl_fft_tpu.ops.pallas import _tuned
    out = "opencl_fft_tpu/ops/pallas/_tuned.py"
    with open(out, "w") as f:
        f.write('"""Measured kernel-vs-XLA winners per (nparts, bins), '
                'generated by\ntools/autotune_blockstep.py with interleaved '
                'A/B timing on the target\nchip. ``pallas="auto"`` consults '
                'this; unmeasured shapes use XLA."""\n\nWINNERS = {\n')
        for (nparts, bins), (winner, row) in sorted(results.items()):
            tag = winner if winner != "off" else "xla"
            if isinstance(row, dict):              # fresh measurement
                note = f"  # us/block: {row}"
            elif row:                              # carried-over comment
                note = f"  # {row}"
            else:
                note = "  # carried over (see prior tune logs)"
            f.write(f"    ({nparts}, {bins}): {tag!r},{note}\n")
        # re-emit standalone comment blocks from inside the prior table
        # (operational notes like the (4096, 512) relay-wedge warning)
        for line in loose_comments:
            f.write(line)
        f.write("}\n")
        # preserve the dconv table (tuned by tools/autotune_dconv.py)
        f.write("\n# Direct-FIR whole-scan kernel winners per (irsize, "
                "vsize), measured by\n# tools/autotune_dconv.py. "
                "Unmeasured shapes use the XLA scan.\nDCONV_WINNERS = {\n")
        for key, tag in sorted(getattr(_tuned, "DCONV_WINNERS", {}).items()):
            f.write(f"    {key}: {tag!r},\n")
        f.write("}\n")
        # preserve the batched-kernel crossover (tools/serving_scaling.py)
        cross = getattr(_tuned, "BATCHED_KERNEL_MAX_CH", None)
        if cross is not None:
            f.write(
                "\n# Measured channel-count crossover for the batched "
                "whole-scan kernels\n# (tools/serving_scaling.py "
                "interleaved A/B): pallas=\"auto\" routes the batched\n"
                "# kernel only at nch <= this.\n"
                f"BATCHED_KERNEL_MAX_CH = {cross!r}\n")
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
