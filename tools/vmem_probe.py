"""Empirical scoped-VMEM footprint probe for the whole-scan kernels.

The fits_vmem_* gates in ops/pallas/{streamstep,splitstep}.py must
predict whether Mosaic can compile a shape WITHOUT compiling it (a
failed compile aborts the caller, and the gate decides production
dispatch). The r3 sweep crash showed the hand-counted plane models
underestimate the real footprint ~2.3x — Mosaic double-buffers the
pipelined refs and keeps the unrolled body's (nparts, bins) temporaries
live on the stack (observed: TV classic at (2048, 512) needs 127.11 MB
where the 12-plane model said 56.6 MB).

This tool measures ground truth on the target chip: for each (kernel
family, shape) it runs a minimal 8-block scan under the PRODUCTION vmem
limit and records PASS, or parses the actual byte requirement out of
Mosaic's OOM message. OOM probes are safe: the compile fails server-side
in ~30 s with a clean exception (no relay wedge — that failure mode is
specific to giant XLA scan programs, see CLAUDE.md).

    python tools/vmem_probe.py [--families classic_tv,split_tv,...]
    # writes bench_results/vmem_probe.json

The results calibrate the fits_vmem_* gates; each gate cites the probe
rows that pin its coefficients.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, ".")

import numpy as np


def _mk_plane(rng, nparts, bins):
    import jax.numpy as jnp
    return (jnp.asarray(rng.standard_normal((nparts, bins)) * 0.1,
                        jnp.float32),
            jnp.asarray(rng.standard_normal((nparts, bins)) * 0.1,
                        jnp.float32))


def probe_one(family: str, nparts: int, bins: int, batch: int = 1):
    """Compile + run one tiny scan through the requested kernel. Returns
    (status, detail): ("pass", us ignored) or ("oom", reported_MB) or
    ("error", message)."""
    import jax
    import jax.numpy as jnp

    from opencl_fft_tpu.ops.pallas import splitstep as SS
    from opencl_fft_tpu.ops.pallas import streamstep as ST

    rng = np.random.default_rng(0)
    nblocks = 8
    pts = bins
    w0 = _mk_plane(rng, nparts * batch, bins)
    h = _mk_plane(rng, nparts * batch, bins)

    try:
        if family == "classic_lti":
            blocks = jnp.zeros((nblocks, pts), jnp.float32)
            tail = jnp.zeros((bins,), jnp.float32)
            out = ST.stream_steps_fused(blocks, w0, h, 0.5, tail, pts)
        elif family == "classic_tv":
            blocks2 = jnp.zeros((2 * nblocks, pts), jnp.float32)
            tail = jnp.zeros((bins,), jnp.float32)
            out = ST.stream_steps_fused_tv(blocks2, w0, h, 0, 0.5, tail, pts)
        elif family == "split_lti":
            blocks = jnp.zeros((nblocks, pts), jnp.float32)
            tail = jnp.zeros((bins,), jnp.float32)
            out = SS.stream_steps_fused_split(blocks, w0, h, 0.5, tail, pts)
        elif family == "split_tv":
            blocks2 = jnp.zeros((2 * nblocks, pts), jnp.float32)
            tail = jnp.zeros((bins,), jnp.float32)
            out = SS.stream_steps_fused_split_tv(blocks2, w0, h, 0, 0.5,
                                                 tail, pts)
        elif family == "batched_lti":
            blocks = jnp.zeros((nblocks * batch, pts), jnp.float32)
            tails = jnp.zeros((batch, bins), jnp.float32)
            out = ST.stream_steps_fused_batched(blocks, w0, h, 0.5, tails,
                                                pts, batch)
        elif family == "batched_tv":
            blocks2 = jnp.zeros((2 * nblocks * batch, pts), jnp.float32)
            tails = jnp.zeros((batch, bins), jnp.float32)
            out = ST.stream_steps_fused_batched_tv(blocks2, w0, h, 0, 0.5,
                                                   tails, pts, batch)
        elif family in ("macflow_lti", "macflow_tv"):
            from opencl_fft_tpu.ops.pallas import macflow as MFK
            rows = nparts - 1 + nblocks
            xtl = _mk_plane(rng, rows, bins)
            if family == "macflow_lti":
                out = MFK.macflow_lti(xtl, h, nblocks, 2.0)
            else:
                htl = _mk_plane(rng, rows, bins)
                out = MFK.macflow_tv(xtl, htl, nblocks, nparts, 2.0, 0)
        else:
            raise ValueError(f"unknown family {family}")
        float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))   # force execution
        return "pass", None
    except Exception as e:  # noqa: BLE001 — classify below
        msg = str(e)
        m = re.search(r"size ([0-9.]+)M and limit ([0-9.]+)M", msg)
        if m and "vmem" in msg:
            return "oom", float(m.group(1))
        return "error", msg[:300]


# The probe grid brackets every gate decision the dispatch layer makes:
# bins=512 rows (classic kernels, the M=512 benchmark row + serving),
# bins=2048 rows (split kernels, the M=2048 row), and the batched
# serving shapes (nparts=256, bins=512, channel groups).
GRID = [
    ("classic_lti", 2048, 512, 1),    # measured winner (5.68us) — must pass
    ("classic_lti", 4096, 512, 1),    # floor-proof candidate
    ("classic_tv", 512, 512, 1),
    ("classic_tv", 1024, 512, 1),
    ("classic_tv", 2048, 512, 1),     # known OOM 127.11M (sweep512 crash)
    ("split_lti", 512, 2048, 1),      # measured winner (7.84us) — must pass
    ("split_lti", 1024, 2048, 1),
    ("split_tv", 128, 2048, 1),
    ("split_tv", 256, 2048, 1),
    ("split_tv", 512, 2048, 1),
    ("batched_lti", 256, 512, 8),
    ("batched_lti", 256, 512, 16),    # current gate's cmax at serving shape
    ("batched_lti", 256, 512, 32),
    ("batched_tv", 256, 512, 8),      # current TV gate's cmax
    ("batched_tv", 256, 512, 16),
    # round-2 envelope extension (first round passed everything below
    # these): the M=512 row's largest point, the M=2048 row's largest
    # points, and serving channel groups one doubling further out
    ("classic_lti", 8192, 512, 1),    # M=512, L=2^22
    ("split_lti", 2048, 2048, 1),     # M=2048, L=2^22
    ("split_tv", 1024, 2048, 1),      # M=2048, L=2^21 TV
    # r4 HBM-streamed MAC kernels (ops/pallas/macflow.py): O(tile) VMEM
    # by design — probe the dispatch extremes (deepest nparts at 512,
    # split-territory bins, the widest-bins minimum-tile carve-out)
    ("macflow_tv", 8192, 512, 1),     # M=512, L=2^22 TV
    ("macflow_lti", 8192, 512, 1),
    ("macflow_tv", 2048, 2048, 1),    # M=2048, L=2^22 TV
    ("macflow_tv", 512, 8192, 1),     # M=8192, L=2^22 TV
    ("macflow_tv", 128, 32768, 1),    # M=32768, L=2^22 (min-tile ceil)
]


def _parse_key(key: str):
    m = re.match(r"(\w+):np=(\d+),b=(\d+),c=(\d+)", key)
    return (m.group(1), int(m.group(2)), int(m.group(3)),
            int(m.group(4))) if m else None


def verify_envelope(out_path: str) -> int:
    """Re-probe the PASS edge of every family recorded in the artifact
    (the largest plane-bytes shape that compiled) and FAIL LOUDLY if the
    envelope shrank — the fits_vmem_* gate coefficients are hand-fit to
    observed behavior and silently go stale across backend updates
    (VERDICT r3 #10). Run after any jax/libtpu bump: a nonzero exit
    means the gates admit shapes that no longer compile."""
    try:
        with open(out_path) as f:
            prior = json.load(f)
    except (OSError, json.JSONDecodeError):
        print(f"--verify: no prior artifact at {out_path}", file=sys.stderr)
        return 2
    edges = {}
    for key, row in prior.items():
        parsed = _parse_key(key)
        if not parsed or row.get("status") != "pass":
            continue
        family, nparts, bins, batch = parsed
        plane = batch * nparts * bins
        if family not in edges or plane > edges[family][0]:
            edges[family] = (plane, parsed)
    bad = 0
    for family, (_, (fam, nparts, bins, batch)) in sorted(edges.items()):
        status, detail = probe_one(fam, nparts, bins, batch)
        tag = "OK" if status == "pass" else "SHRANK"
        print(f"--verify {fam}:np={nparts},b={bins},c={batch}: "
              f"recorded pass -> {status} [{tag}]"
              + (f" ({detail})" if status != "pass" and detail else ""),
              file=sys.stderr, flush=True)
        if status != "pass":
            bad += 1
    if bad:
        print(f"--verify: {bad} recorded-PASS edge(s) no longer compile "
              f"— recalibrate the fits_vmem_* gates and re-run the full "
              f"probe grid", file=sys.stderr)
    return 1 if bad else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=str, default=None,
                    help="comma-separated family filter")
    ap.add_argument("--out", default="bench_results/vmem_probe.json")
    ap.add_argument("--skip-done", action="store_true",
                    help="skip shapes already recorded in --out")
    ap.add_argument("--verify", action="store_true",
                    help="re-probe each family's recorded PASS edge and "
                         "exit 1 if the measured envelope shrank")
    args = ap.parse_args()

    if args.verify:
        raise SystemExit(verify_envelope(args.out))

    fams = set(args.families.split(",")) if args.families else None
    results = {}
    try:
        with open(args.out) as f:
            results = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass

    for family, nparts, bins, batch in GRID:
        if fams and family not in fams:
            continue
        key = f"{family}:np={nparts},b={bins},c={batch}"
        if args.skip_done and key in results:
            continue
        status, detail = probe_one(family, nparts, bins, batch)
        results[key] = {"status": status}
        if status == "oom":
            results[key]["reported_mb"] = detail
        elif status == "error":
            results[key]["message"] = detail
        print(f"{key}: {status}"
              + (f" ({detail} MB reported)" if status == "oom" else "")
              + (f" ({detail})" if status == "error" else ""),
              file=sys.stderr, flush=True)
        with open(args.out, "w") as f:       # persist incrementally
            json.dump(results, f, indent=2)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
