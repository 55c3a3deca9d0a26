"""Pallas TPU kernel: GRID-STREAMED partitioned-convolution scan — the
whole multi-block stream as ONE device launch.

The per-launch block-step kernels (blockstep.py) still pay, every block,
for (a) the pallas launch + XLA glue and (b) DMA-ing the fused tables
(wfwd/wpost, ~6 MB at the headline shape) from HBM into VMEM. Across a
streamed scan those costs dominate: the measured headline block spends
~10 of its ~13 us on them (bench_results/fwd_mm_ab.json).

This kernel runs the scan as a sequential grid over blocks (TPU grids
execute in order), keeping EVERYTHING resident in VMEM across steps:

  * the sliding spectral window W (the ring, re-based so the MAC needs
    no rotate-switch: row q is always frame (rp+q) — one static
    ``pltpu.roll`` by nparts-1 per step slides it, replacing the
    doubled-ring dynamic-slice of mac.py entirely),
  * the IR spectra h (constant-index input block, loaded once),
  * both fused tables (wfwd: forward rFFT of the zero-padded frame as
    one matmul; wpost: unpack + inverse DFT + deinterleave as one
    matmul — blockstep._wfwd_np/_wpost_np),
  * the overlap-add tail and the window state, carried in the OUTPUT
    refs (constant index map => flushed to HBM once, at the end).

Per step the only HBM traffic is the (1, pts) input block in and the
(1, pts) output block out (both auto-pipelined by the grid BlockSpecs) —
the stream state never leaves the chip, which is the design the
reference's per-kernel-launch + blocking-copy loop (cl_conv.cpp:393-458)
could not express. Per-block semantics (MAC window contents, bin-0
handling, /pts OLA, one-block latency) are IDENTICAL to pconv_step; the
wrapper in ops/pconv.py translates PconvState's doubled ring to/from the
window layout with one dynamic_slice / roll per SCAN (not per block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

_VMEM_LIMIT = 100 * 1024 * 1024

# Measured VMEM envelope per kernel family: the largest state-plane byte
# count (rows x bins x 4 f32, rows = C*nparts for the batched kernels)
# that COMPILED under the 100 MB scoped cap on the target chip, per
# tools/vmem_probe.py (artifact: bench_results/vmem_probe.json). Mosaic's
# true footprint is ~2-3.5x the hand-counted resident-plane models
# (pipeline double-buffering plus the unrolled body's live (rows, bins)
# temporaries): the TV kernel at (2048, 512) needs 121.19 MB where the
# 12-plane model said 56.6 MB — which crashed the r3 sweep512 run. The
# gates therefore admit nothing beyond the measured PASS bound on the
# plane axis (the next doubling is a measured FAIL in every family).
_PLANE_PASS_MAX = {
    "classic_lti": 4096 * 512 * 4,     # pass; 8192x512 ooms (127.27 MB)
    "classic_tv": 1024 * 512 * 4,      # pass; 2048x512 ooms (121.19 MB)
    "batched_lti": 16 * 256 * 512 * 4,  # pass; c=32 compile fails
    "batched_tv": 8 * 256 * 512 * 4,    # pass; c=16 compile fails
}

# Scoped-VMEM cost model, calibrated from observed OOM reports and the
# largest measured passes:
#   total ~= internal(family, plane) + outs_bytes(scan length)
# where outs_bytes is the whole launch's OUTPUT block rows (nblocks x
# batch x bins f32) — the r3 bench crash decomposes as 104.55 MB =
# internal 89.3 + outs 15.2 for a 464-block x 16-channel scan whose
# 8-block probe passed, while the serving TV c=8 kernel ran 1880-block
# scans (input rows alone would be 123 MB), proving the pipelined INPUT
# does not count. internal = tables + onehot + K x plane_bytes with K
# from the OOM reports (exact) or the upper bound implied by the largest
# pass (conservative: a high internal estimate only shrinks the
# per-launch segment).
_INTERNAL_K = {
    "classic_lti": 7.5,    # (127.27-6.3)/16.78 = 7.2 at (8192,512) OOM
    "classic_tv": 28.0,    # (121.19-6.3)/4.19 = 27.4 at (2048,512) OOM
    "batched_lti": 10.0,   # (104.55-15.2-6.8)/8.39 = 9.8 at c=16 OOM
    "batched_tv": 15.0,    # <= 14.9 from the c=8 1880-block serving pass
}
_SEG_BUDGET_CAP = 92 * 1024 * 1024    # 8 MB margin under the scoped cap
# floor: at envelope-edge shapes (internal estimate ~cap) passes were
# measured with ~1-4 MB of output rows; 4 MB reproduces exactly the
# 512-block segments those measurements used at bins=2048
_SEG_FLOOR_BYTES = 4 * 1024 * 1024


def max_scan_blocks(nparts: int, bins: int, batch: int = 1,
                    tv: bool = False, split: bool = False) -> int:
    """Largest per-launch block count the scoped-VMEM budget takes at
    this shape — the wrappers cut longer scans into segments, threading
    the returned window/tail (and TV h) state into the next launch (the
    kernel's final window layout IS the next segment's initial window)."""
    if split:
        # half-table kernels: tables 2 bins^2 + coef stacks; K bounds
        # from the largest passes ((1024,2048) LTI probe, (512,2048) TV
        # sweep measurement)
        k = 16.0 if tv else 8.0
        tables = 2 * bins * bins * 4 + 2 * 8 * bins * 4
    else:
        family = ("batched_" if batch > 1 else "classic_") + \
            ("tv" if tv else "lti")
        k = _INTERNAL_K[family]
        tables = (2 * bins * bins + 4 * bins * bins) * 4
    plane = batch * nparts * bins * 4
    onehot = (3 if tv else 2) * batch * nparts * batch * 4 if batch > 1 else 0
    internal = tables + onehot + k * plane
    budget = max(_SEG_BUDGET_CAP - internal, _SEG_FLOOR_BYTES)
    per_block = batch * bins * 4                  # output rows per block
    seg = int(budget // per_block)
    return max(_STEP_GROUP, seg - seg % _STEP_GROUP)


def fits_vmem_streamstep(nparts: int, bins: int) -> bool:
    """VMEM gate for the LTI kernel: the naive resident-set model (wfwd
    (b, 2b) + wpost (2b, 2b) tables + 8 (nparts, bins) planes) under
    80 MB — which bounds the tables axis — AND the state-plane bytes
    within the measured compile envelope (_PLANE_PASS_MAX)."""
    if nparts < 8 or bins % 128:
        return False
    tables = (2 * bins * bins + 4 * bins * bins) * 4
    plane = nparts * bins * 4
    return (tables + 8 * plane <= 80 * 1024 * 1024
            and plane <= _PLANE_PASS_MAX["classic_lti"])


def fits_vmem_streamstep_tv(nparts: int, bins: int) -> bool:
    """TIME-VARYING gate: the h ring is resident too (12-plane naive
    model) and the measured envelope is strictly tighter than the LTI
    kernel's — (2048, 512) compiles LTI but OOMs TV (121.19 MB)."""
    if not fits_vmem_streamstep(nparts, bins):
        return False
    tables = (2 * bins * bins + 4 * bins * bins) * 4
    plane = nparts * bins * 4
    # naive cap = largest measured-PASS naive value (31.5 MB at
    # (1024, 512)) — bounds the tables axis jointly with the planes
    return (tables + 12 * plane <= 32 * 1024 * 1024
            and plane <= _PLANE_PASS_MAX["classic_tv"])


# Blocks processed per grid step: Mosaic requires block sublane dims
# divisible by 8, so the (G, pts) input slice carries 8 blocks and the
# kernel walks them with a static inner loop. The wrapper routes any
# remainder (nblocks % 8) through the per-block scan path.
_STEP_GROUP = 8


def _stream_kernel(nparts, bins, b0_scale, pts, nsteps,
                   blk_ref, w0r_ref, w0i_ref, hr_ref, hi_ref,
                   wfwd_ref, wpost_ref, tail0_ref,
                   out_ref, wfr_ref, wfi_ref, tailf_ref,
                   wr_s, wi_s, tl_s):
    """Carried state (window planes, OLA tail) lives in SCRATCH — scratch
    is guaranteed to persist across the sequential grid, while output
    blocks may be double-buffered by the pipeline. The final state is
    flushed to the state outputs on the last step only."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        wr_s[:] = w0r_ref[:]
        wi_s[:] = w0i_ref[:]
        tl_s[:] = tail0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    # forward rFFT of the zero-padded frames: one matmul for the whole
    # group (table resident)
    zf = jax.lax.dot(blk_ref[:], wfwd_ref[:], precision=hp)    # (G, 2b)

    lastrow = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 0) \
        == nparts - 1
    col0 = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 1) == 0
    hr = hr_ref[:]
    hi = hi_ref[:]

    for g in range(_STEP_GROUP):                   # static unroll
        fr, fi = zf[g:g + 1, :bins], zf[g:g + 1, bins:]
        # slide the window one block: row q <- row q+1, freshest into
        # the last row (static shift, static row — no dynamic indexing)
        wr = jnp.where(lastrow, fr, pltpu.roll(wr_s[:], nparts - 1, 0))
        wi = jnp.where(lastrow, fi, pltpu.roll(wi_s[:], nparts - 1, 0))
        wr_s[:] = wr
        wi_s[:] = wi

        # frequency-delay-line MAC (identical math/order to blockstep's
        # _window_mac: elementwise products, bin-0 componentwise with
        # the b0 scale, deterministic sum over the partition axis)
        prod_r = wr * hr - wi * hi
        prod_i = wr * hi + wi * hr
        prod_r = jnp.where(col0, b0_scale * wr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * wi * hi, prod_i)
        re = jnp.sum(prod_r, axis=0, keepdims=True)
        im = jnp.sum(prod_i, axis=0, keepdims=True)

        # unpack + inverse DFT + deinterleave: one matmul; overlap-add
        z = jnp.concatenate([re, im], axis=1)                  # (1, 2b)
        y = jax.lax.dot(z, wpost_ref[:], precision=hp)
        out_ref[g:g + 1, :] = (y[:, :pts] + tl_s[:]) / float(pts)
        tl_s[:] = y[:, pts:]

    @pl.when(j == nsteps - 1)
    def _flush():
        wfr_ref[:] = wr_s[:]
        wfi_ref[:] = wi_s[:]
        tailf_ref[:] = tl_s[:]


def stream_steps_fused(blocks, w0: Cplx, h: Cplx, b0_scale: float,
                       tail, pts: int, interpret: bool = False):
    """Run an entire LTI streaming scan in one launch.

    blocks: (nblocks, pts), nblocks a multiple of _STEP_GROUP; w0: split
    (nparts, bins) initial window in MAC layout (row q = frame (rp0+q),
    i.e. doubled-ring rows [wp0, wp0+nparts)); h: split (nparts, bins)
    IR spectra (stored reversed, as in PconvState); tail: (bins,).
    Returns (outs (nblocks, pts), w_fin: Cplx, tail_fin (bins,)) — w_fin
    row q holds frame (rp_last+q), rp_last = wp0 + nblocks.
    """
    from .blockstep import _fused_tables

    w0r, w0i = w0
    hr, hi = h
    nparts, bins = hr.shape
    nblocks = blocks.shape[0]
    if nblocks % _STEP_GROUP:
        raise ValueError(
            f"nblocks must be a multiple of {_STEP_GROUP}, got {nblocks} "
            f"(the pconv_stream wrapper handles remainders)")
    nsteps = nblocks // _STEP_GROUP
    kern = functools.partial(_stream_kernel, nparts, bins,
                             float(b0_scale), int(pts), int(nsteps))
    plane = jax.ShapeDtypeStruct((nparts, bins), jnp.float32)
    grid = (nsteps,)
    const = lambda j: (0, 0)
    outs, wfr, wfi, tailf = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, pts), jnp.float32),
            plane, plane,
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((_STEP_GROUP, pts), lambda j: (j, 0)),  # group j
            pl.BlockSpec((nparts, bins), const),               # W0 re
            pl.BlockSpec((nparts, bins), const),               # W0 im
            pl.BlockSpec((nparts, bins), const),               # h re
            pl.BlockSpec((nparts, bins), const),               # h im
            pl.BlockSpec((pts, 2 * bins), const),              # wfwd
            pl.BlockSpec((2 * bins, 2 * bins), const),         # wpost
            pl.BlockSpec((1, bins), const),                    # tail0
        ],
        out_specs=(
            pl.BlockSpec((_STEP_GROUP, pts), lambda j: (j, 0)),
            pl.BlockSpec((nparts, bins), const),
            pl.BlockSpec((nparts, bins), const),
            pl.BlockSpec((1, bins), const),
        ),
        scratch_shapes=[
            pltpu.VMEM((nparts, bins), jnp.float32),
            pltpu.VMEM((nparts, bins), jnp.float32),
            pltpu.VMEM((1, bins), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks, jnp.float32), w0r, w0i, hr, hi,
      *_fused_tables(bins), jnp.asarray(tail).reshape(1, bins))
    return outs, (wfr, wfi), tailf[0]


def _stream_tv_kernel(nparts, bins, b0_scale, pts, nsteps,
                      blk_ref, w0r_ref, w0i_ref, h0r_ref, h0i_ref,
                      wfwd_ref, wpost_ref, tail0_ref, wp2_ref,
                      out_ref, wfr_ref, wfi_ref, hfr_ref, hfi_ref,
                      tailf_ref, wr_s, wi_s, hr_s, hi_s, tl_s):
    """TIME-VARYING whole-scan step: both operands stream. The x window
    slides exactly as the LTI kernel; the h ring updates IN PLACE at the
    decrementing absolute slot wp2 (an iota-mask row select — h rows are
    indexed by MAC position, they do not slide), replacing the dual
    command queues + per-block launches of cl_conv.cpp:460-548 with one
    resident launch for the whole stream."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        wr_s[:] = w0r_ref[:]
        wi_s[:] = w0i_ref[:]
        hr_s[:] = h0r_ref[:]
        hi_s[:] = h0i_ref[:]
        tl_s[:] = tail0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    # both forwards for the whole group in one matmul: rows 2t / 2t+1
    # hold block t's input / coefficient frames
    zf = jax.lax.dot(blk_ref[:], wfwd_ref[:], precision=hp)  # (2G, 2b)

    lastrow = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 0) \
        == nparts - 1
    col0 = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 1) == 0
    rowid = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 0)
    wp2_0 = wp2_ref[0]

    for g in range(_STEP_GROUP):                   # static unroll
        fxr = zf[2 * g:2 * g + 1, :bins]
        fxi = zf[2 * g:2 * g + 1, bins:]
        fhr = zf[2 * g + 1:2 * g + 2, :bins]
        fhi = zf[2 * g + 1:2 * g + 2, bins:]

        # fresh coefficient frame lands at slot wp2 (pre-decrement) and
        # participates in this block's MAC (cl_conv.cpp:510-519)
        idx = jnp.mod(wp2_0 - (j * _STEP_GROUP + g), nparts)
        hrow = rowid == idx
        hr = jnp.where(hrow, fhr, hr_s[:])
        hi = jnp.where(hrow, fhi, hi_s[:])
        hr_s[:] = hr
        hi_s[:] = hi

        wr = jnp.where(lastrow, fxr, pltpu.roll(wr_s[:], nparts - 1, 0))
        wi = jnp.where(lastrow, fxi, pltpu.roll(wi_s[:], nparts - 1, 0))
        wr_s[:] = wr
        wi_s[:] = wi

        prod_r = wr * hr - wi * hi
        prod_i = wr * hi + wi * hr
        prod_r = jnp.where(col0, b0_scale * wr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * wi * hi, prod_i)
        re = jnp.sum(prod_r, axis=0, keepdims=True)
        im = jnp.sum(prod_i, axis=0, keepdims=True)

        z = jnp.concatenate([re, im], axis=1)
        y = jax.lax.dot(z, wpost_ref[:], precision=hp)
        out_ref[g:g + 1, :] = (y[:, :pts] + tl_s[:]) / float(pts)
        tl_s[:] = y[:, pts:]

    @pl.when(j == nsteps - 1)
    def _flush():
        wfr_ref[:] = wr_s[:]
        wfi_ref[:] = wi_s[:]
        hfr_ref[:] = hr_s[:]
        hfi_ref[:] = hi_s[:]
        tailf_ref[:] = tl_s[:]


def stream_steps_fused_tv(blocks2, w0: Cplx, h0: Cplx, wp2, b0_scale: float,
                          tail, pts: int, interpret: bool = False):
    """Run an entire TIME-VARYING streaming scan in one launch.

    blocks2: (2*nblocks, pts) — rows 2t / 2t+1 are block t's input /
    coefficient frames (nblocks a multiple of _STEP_GROUP); w0 as in
    stream_steps_fused; h0: split (nparts, bins) coefficient ring (MAC
    layout, updated at the decrementing slot wp2); tail: (bins,).
    Returns (outs (nblocks, pts), w_fin, h_fin, tail_fin).
    """
    from .blockstep import _fused_tables

    w0r, w0i = w0
    h0r, h0i = h0
    nparts, bins = h0r.shape
    nblocks = blocks2.shape[0] // 2
    if blocks2.shape[0] % (2 * _STEP_GROUP):
        raise ValueError(
            f"need 2*nblocks rows with nblocks a multiple of "
            f"{_STEP_GROUP}, got {blocks2.shape[0]} rows")
    nsteps = nblocks // _STEP_GROUP
    kern = functools.partial(_stream_tv_kernel, nparts, bins,
                             float(b0_scale), int(pts), int(nsteps))
    plane = jax.ShapeDtypeStruct((nparts, bins), jnp.float32)
    grid = (nsteps,)
    const = lambda j: (0, 0)
    outs, wfr, wfi, hfr, hfi, tailf = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, pts), jnp.float32),
            plane, plane, plane, plane,
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((2 * _STEP_GROUP, pts), lambda j: (j, 0)),
            pl.BlockSpec((nparts, bins), const),               # W0 re
            pl.BlockSpec((nparts, bins), const),               # W0 im
            pl.BlockSpec((nparts, bins), const),               # h0 re
            pl.BlockSpec((nparts, bins), const),               # h0 im
            pl.BlockSpec((pts, 2 * bins), const),              # wfwd
            pl.BlockSpec((2 * bins, 2 * bins), const),         # wpost
            pl.BlockSpec((1, bins), const),                    # tail0
            pl.BlockSpec(memory_space=pltpu.SMEM),             # wp2
        ],
        out_specs=(
            pl.BlockSpec((_STEP_GROUP, pts), lambda j: (j, 0)),
            pl.BlockSpec((nparts, bins), const),
            pl.BlockSpec((nparts, bins), const),
            pl.BlockSpec((nparts, bins), const),
            pl.BlockSpec((nparts, bins), const),
            pl.BlockSpec((1, bins), const),
        ),
        scratch_shapes=[
            pltpu.VMEM((nparts, bins), jnp.float32),
            pltpu.VMEM((nparts, bins), jnp.float32),
            pltpu.VMEM((nparts, bins), jnp.float32),
            pltpu.VMEM((nparts, bins), jnp.float32),
            pltpu.VMEM((1, bins), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks2, jnp.float32), w0r, w0i, h0r, h0i,
      *_fused_tables(bins), jnp.asarray(tail).reshape(1, bins),
      jnp.asarray(wp2, jnp.int32).reshape(1))
    return outs, (wfr, wfi), (hfr, hfi), tailf[0]


# ---------------------------------------------------------------------------
# Batched (multi-channel serving) variant: C independent channels stacked
# along the sublane axis, each with its own window/h/tail — the serving
# regime's per-channel rings never touch HBM during the stream.
# ---------------------------------------------------------------------------

def fits_vmem_streamstep_batched(nparts: int, bins: int, batch: int) -> bool:
    """Stacked planes scale the budget by the channel count: W scratch +
    W in/out + h, each (batch*nparts, bins) f32 re/im, plus the shared
    tables and the one-hot selector matrices — under the naive 80 MB
    model AND the measured stacked-plane envelope (_PLANE_PASS_MAX)."""
    if nparts < 8 or bins % 128 or batch < 1:
        return False
    tables = (2 * bins * bins + 4 * bins * bins) * 4
    plane = batch * nparts * bins * 4
    onehot = 2 * batch * nparts * batch * 4
    return (tables + 8 * plane + onehot <= 80 * 1024 * 1024
            and plane <= _PLANE_PASS_MAX["batched_lti"])


@functools.lru_cache(maxsize=None)
def _channel_onehots_np(nparts: int, batch: int):
    """S (C*np, C): S @ fresh places channel c's fresh row at c*np+np-1
    (zeros elsewhere); R (C, C*np): R @ prod sums each channel's np rows.
    One-hot MXU matmuls are bit-exact (cf. blockstep flip matrix)."""
    import numpy as np
    s = np.zeros((batch * nparts, batch), np.float32)
    r = np.zeros((batch, batch * nparts), np.float32)
    for c in range(batch):
        s[c * nparts + nparts - 1, c] = 1.0
        r[c, c * nparts:(c + 1) * nparts] = 1.0
    return s, r


def _stream_batched_kernel(nparts, bins, batch, b0_scale, pts, nsteps,
                           blk_ref, w0r_ref, w0i_ref, hr_ref, hi_ref,
                           wfwd_ref, wpost_ref, tail0_ref, sel_ref, red_ref,
                           out_ref, wfr_ref, wfi_ref, tailf_ref,
                           wr_s, wi_s, tl_s):
    """Per grid step: G blocks x C channels. The stacked window rolls as
    ONE (C*np, bins) plane — the roll wraps channel boundaries, but every
    wrapped row is exactly a fresh-frame row and is overwritten by the
    one-hot scatter before the MAC reads it."""
    j = pl.program_id(0)
    cnp = batch * nparts

    @pl.when(j == 0)
    def _init():
        wr_s[:] = w0r_ref[:]
        wi_s[:] = w0i_ref[:]
        tl_s[:] = tail0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    zf = jax.lax.dot(blk_ref[:], wfwd_ref[:], precision=hp)  # (G*C, 2b)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (cnp, bins), 0)
    lastrow = rowid % nparts == nparts - 1
    col0 = jax.lax.broadcasted_iota(jnp.int32, (cnp, bins), 1) == 0
    hr = hr_ref[:]
    hi = hi_ref[:]
    sel = sel_ref[:]
    red = red_ref[:]

    for g in range(_STEP_GROUP):                   # static unroll
        fr = zf[g * batch:(g + 1) * batch, :bins]   # (C, b)
        fi = zf[g * batch:(g + 1) * batch, bins:]
        fresh_r = jax.lax.dot(sel, fr, precision=hp)   # (C*np, b) scatter
        fresh_i = jax.lax.dot(sel, fi, precision=hp)
        wr = jnp.where(lastrow, fresh_r, pltpu.roll(wr_s[:], cnp - 1, 0))
        wi = jnp.where(lastrow, fresh_i, pltpu.roll(wi_s[:], cnp - 1, 0))
        wr_s[:] = wr
        wi_s[:] = wi

        prod_r = wr * hr - wi * hi
        prod_i = wr * hi + wi * hr
        prod_r = jnp.where(col0, b0_scale * wr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * wi * hi, prod_i)
        re = jax.lax.dot(red, prod_r, precision=hp)    # (C, b) per-channel
        im = jax.lax.dot(red, prod_i, precision=hp)

        z = jnp.concatenate([re, im], axis=1)          # (C, 2b)
        y = jax.lax.dot(z, wpost_ref[:], precision=hp)
        out_ref[g * batch:(g + 1) * batch, :] = \
            (y[:, :pts] + tl_s[:]) / float(pts)
        tl_s[:] = y[:, pts:]

    @pl.when(j == nsteps - 1)
    def _flush():
        wfr_ref[:] = wr_s[:]
        wfi_ref[:] = wi_s[:]
        tailf_ref[:] = tl_s[:]


def stream_steps_fused_batched(blocks, w0: Cplx, h: Cplx, b0_scale: float,
                               tails, pts: int, batch: int,
                               interpret: bool = False):
    """Batched LTI whole-scan: C channels, each with its own window / IR
    spectra / tail, stacked along the sublane axis.

    blocks: (nblocks*batch, pts) — row t*batch + c is block t of channel
    c (nblocks a multiple of _STEP_GROUP); w0/h: split (batch*nparts,
    bins) stacked planes (channel c occupies rows [c*np, (c+1)*np), each
    in the single-channel MAC layout); tails: (batch, bins). Returns
    (outs (nblocks*batch, pts), w_fin, tails_fin).
    """
    from .blockstep import _fused_tables

    w0r, w0i = w0
    hr, hi = h
    cnp, bins = hr.shape
    nparts = cnp // batch
    rows = blocks.shape[0]
    nblocks = rows // batch
    if rows % (batch * _STEP_GROUP):
        raise ValueError(
            f"need nblocks*batch rows with nblocks a multiple of "
            f"{_STEP_GROUP}, got {rows} rows for batch {batch}")
    nsteps = nblocks // _STEP_GROUP
    sel, red = _channel_onehots_np(nparts, batch)
    kern = functools.partial(_stream_batched_kernel, nparts, bins, batch,
                             float(b0_scale), int(pts), int(nsteps))
    plane = jax.ShapeDtypeStruct((cnp, bins), jnp.float32)
    grid = (nsteps,)
    const = lambda j: (0, 0)
    gc = _STEP_GROUP * batch
    outs, wfr, wfi, tailf = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((rows, pts), jnp.float32),
            plane, plane,
            jax.ShapeDtypeStruct((batch, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((gc, pts), lambda j: (j, 0)),
            pl.BlockSpec((cnp, bins), const),              # W0 re
            pl.BlockSpec((cnp, bins), const),              # W0 im
            pl.BlockSpec((cnp, bins), const),              # h re
            pl.BlockSpec((cnp, bins), const),              # h im
            pl.BlockSpec((pts, 2 * bins), const),          # wfwd
            pl.BlockSpec((2 * bins, 2 * bins), const),     # wpost
            pl.BlockSpec((batch, bins), const),            # tails
            pl.BlockSpec((cnp, batch), const),             # scatter
            pl.BlockSpec((batch, cnp), const),             # reduce
        ],
        out_specs=(
            pl.BlockSpec((gc, pts), lambda j: (j, 0)),
            pl.BlockSpec((cnp, bins), const),
            pl.BlockSpec((cnp, bins), const),
            pl.BlockSpec((batch, bins), const),
        ),
        scratch_shapes=[
            pltpu.VMEM((cnp, bins), jnp.float32),
            pltpu.VMEM((cnp, bins), jnp.float32),
            pltpu.VMEM((batch, bins), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks, jnp.float32), w0r, w0i, hr, hi,
      *_fused_tables(bins), jnp.asarray(tails),
      jnp.asarray(sel), jnp.asarray(red))
    return outs, (wfr, wfi), tailf


def fits_vmem_streamstep_batched_tv(nparts: int, bins: int,
                                    batch: int) -> bool:
    """TV serving: h rings resident per channel too — 12 stacked planes
    plus the shared tables and three one-hot matrices, under the naive
    80 MB model AND the measured envelope (_PLANE_PASS_MAX — half the
    LTI kernel's, like the single-channel TV kernel)."""
    if nparts < 8 or bins % 128 or batch < 1:
        return False
    tables = (2 * bins * bins + 4 * bins * bins) * 4
    plane = batch * nparts * bins * 4
    onehot = 3 * batch * nparts * batch * 4
    # naive cap = largest measured-PASS naive value (56.7 MB at
    # (256, 512, c=8))
    return (tables + 12 * plane + onehot <= 57 * 1024 * 1024
            and plane <= _PLANE_PASS_MAX["batched_tv"])


@functools.lru_cache(maxsize=None)
def _channel_broadcast_np(nparts: int, batch: int):
    """B (C*np, C): B @ fresh replicates channel c's fresh row across
    all np rows of channel c — the dynamic h-slot mask then keeps only
    the target row (the slot index is the same for every channel:
    batched_state shares the scalar ring pointers)."""
    import numpy as np
    b = np.zeros((batch * nparts, batch), np.float32)
    for c in range(batch):
        b[c * nparts:(c + 1) * nparts, c] = 1.0
    return b


def _stream_batched_tv_kernel(nparts, bins, batch, b0_scale, pts, nsteps,
                              blk_ref, w0r_ref, w0i_ref, h0r_ref, h0i_ref,
                              wfwd_ref, wpost_ref, tail0_ref, sel_ref,
                              red_ref, bc_ref, wp2_ref,
                              out_ref, wfr_ref, wfi_ref, hfr_ref, hfi_ref,
                              tailf_ref, wr_s, wi_s, hr_s, hi_s, tl_s):
    """Batched TIME-VARYING whole-scan step: both operands stream for
    every channel. Row (2t)*C + c of blk is block t's input frame of
    channel c; (2t+1)*C + c its coefficient frame. The h update lands at
    the decrementing slot wp2 (shared across channels), scattered per
    channel by one broadcast one-hot matmul + the slot mask."""
    j = pl.program_id(0)
    cnp = batch * nparts

    @pl.when(j == 0)
    def _init():
        wr_s[:] = w0r_ref[:]
        wi_s[:] = w0i_ref[:]
        hr_s[:] = h0r_ref[:]
        hi_s[:] = h0i_ref[:]
        tl_s[:] = tail0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    zf = jax.lax.dot(blk_ref[:], wfwd_ref[:], precision=hp)  # (2GC, 2b)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (cnp, bins), 0)
    lastrow = rowid % nparts == nparts - 1
    col0 = jax.lax.broadcasted_iota(jnp.int32, (cnp, bins), 1) == 0
    sel = sel_ref[:]
    red = red_ref[:]
    bc = bc_ref[:]
    wp2_0 = wp2_ref[0]

    for g in range(_STEP_GROUP):                   # static unroll
        fx = zf[2 * g * batch:(2 * g + 1) * batch]       # (C, 2b)
        fh = zf[(2 * g + 1) * batch:(2 * g + 2) * batch]

        idx = jnp.mod(wp2_0 - (j * _STEP_GROUP + g), nparts)
        hrow = (rowid % nparts) == idx
        bh_r = jax.lax.dot(bc, fh[:, :bins], precision=hp)  # (C*np, b)
        bh_i = jax.lax.dot(bc, fh[:, bins:], precision=hp)
        hr = jnp.where(hrow, bh_r, hr_s[:])
        hi = jnp.where(hrow, bh_i, hi_s[:])
        hr_s[:] = hr
        hi_s[:] = hi

        fresh_r = jax.lax.dot(sel, fx[:, :bins], precision=hp)
        fresh_i = jax.lax.dot(sel, fx[:, bins:], precision=hp)
        wr = jnp.where(lastrow, fresh_r, pltpu.roll(wr_s[:], cnp - 1, 0))
        wi = jnp.where(lastrow, fresh_i, pltpu.roll(wi_s[:], cnp - 1, 0))
        wr_s[:] = wr
        wi_s[:] = wi

        prod_r = wr * hr - wi * hi
        prod_i = wr * hi + wi * hr
        prod_r = jnp.where(col0, b0_scale * wr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * wi * hi, prod_i)
        re = jax.lax.dot(red, prod_r, precision=hp)    # (C, b)
        im = jax.lax.dot(red, prod_i, precision=hp)

        z = jnp.concatenate([re, im], axis=1)
        y = jax.lax.dot(z, wpost_ref[:], precision=hp)
        out_ref[g * batch:(g + 1) * batch, :] = \
            (y[:, :pts] + tl_s[:]) / float(pts)
        tl_s[:] = y[:, pts:]

    @pl.when(j == nsteps - 1)
    def _flush():
        wfr_ref[:] = wr_s[:]
        wfi_ref[:] = wi_s[:]
        hfr_ref[:] = hr_s[:]
        hfi_ref[:] = hi_s[:]
        tailf_ref[:] = tl_s[:]


def stream_steps_fused_batched_tv(blocks2, w0: Cplx, h0: Cplx, wp2,
                                  b0_scale: float, tails, pts: int,
                                  batch: int, interpret: bool = False):
    """Batched TV whole-scan: C channels, both operands streaming.

    blocks2: (2*nblocks*batch, pts) — row (2t)*C + c is block t's input
    frame of channel c, row (2t+1)*C + c its coefficient frame (nblocks
    a multiple of _STEP_GROUP); w0/h0: split (batch*nparts, bins)
    stacked planes; tails: (batch, bins). Returns (outs
    (nblocks*batch, pts), w_fin, h_fin, tails_fin)."""
    from .blockstep import _fused_tables

    w0r, w0i = w0
    h0r, h0i = h0
    cnp, bins = h0r.shape
    nparts = cnp // batch
    rows = blocks2.shape[0] // 2
    nblocks = rows // batch
    if blocks2.shape[0] % (2 * batch * _STEP_GROUP):
        raise ValueError(
            f"need 2*nblocks*batch rows with nblocks a multiple of "
            f"{_STEP_GROUP}, got {blocks2.shape[0]} rows for batch "
            f"{batch}")
    nsteps = nblocks // _STEP_GROUP
    sel, red = _channel_onehots_np(nparts, batch)
    bc = _channel_broadcast_np(nparts, batch)
    kern = functools.partial(_stream_batched_tv_kernel, nparts, bins,
                             batch, float(b0_scale), int(pts),
                             int(nsteps))
    plane = jax.ShapeDtypeStruct((cnp, bins), jnp.float32)
    grid = (nsteps,)
    const = lambda j: (0, 0)
    gc = _STEP_GROUP * batch
    outs, wfr, wfi, hfr, hfi, tailf = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((rows, pts), jnp.float32),
            plane, plane, plane, plane,
            jax.ShapeDtypeStruct((batch, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((2 * gc, pts), lambda j: (j, 0)),
            pl.BlockSpec((cnp, bins), const),              # W0 re
            pl.BlockSpec((cnp, bins), const),              # W0 im
            pl.BlockSpec((cnp, bins), const),              # h0 re
            pl.BlockSpec((cnp, bins), const),              # h0 im
            pl.BlockSpec((pts, 2 * bins), const),          # wfwd
            pl.BlockSpec((2 * bins, 2 * bins), const),     # wpost
            pl.BlockSpec((batch, bins), const),            # tails
            pl.BlockSpec((cnp, batch), const),             # scatter
            pl.BlockSpec((batch, cnp), const),             # reduce
            pl.BlockSpec((cnp, batch), const),             # broadcast
            pl.BlockSpec(memory_space=pltpu.SMEM),         # wp2
        ],
        out_specs=(
            pl.BlockSpec((gc, pts), lambda j: (j, 0)),
            pl.BlockSpec((cnp, bins), const),
            pl.BlockSpec((cnp, bins), const),
            pl.BlockSpec((cnp, bins), const),
            pl.BlockSpec((cnp, bins), const),
            pl.BlockSpec((batch, bins), const),
        ),
        scratch_shapes=[
            pltpu.VMEM((cnp, bins), jnp.float32),
            pltpu.VMEM((cnp, bins), jnp.float32),
            pltpu.VMEM((cnp, bins), jnp.float32),
            pltpu.VMEM((cnp, bins), jnp.float32),
            pltpu.VMEM((batch, bins), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks2, jnp.float32), w0r, w0i, h0r, h0i,
      *_fused_tables(bins), jnp.asarray(tails),
      jnp.asarray(sel), jnp.asarray(red), jnp.asarray(bc),
      jnp.asarray(wp2, jnp.int32).reshape(1))
    return outs, (wfr, wfi), (hfr, hfi), tailf
