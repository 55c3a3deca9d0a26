"""Pallas TPU kernel: HBM-streamed sliding-window spectral MAC for
long-IR partitioned convolution (LTI and TIME-VARYING).

Where it sits in the kernel family:

  * streamstep.py / splitstep.py keep the whole ring state VMEM-resident
    across a sequential grid — unbeatable while it fits, but the measured
    compile envelope ends at (4096, 512) LTI / (1024, 512) TV /
    (1024, 2048) split-LTI, which is exactly why the reference grid's
    long-IR corner (M=512 L>=2^20, M=2048 L>=2^21) fell back to the XLA
    scan at 95-530x real time (r3 sweep).
  * chunkmac.py streams the INPUT timeline from HBM but keeps 3 shifted
    coefficient stacks (24 x (nparts+8) x bins floats) resident — it dies
    at nparts >= ~2048 too, and has no TV form at all.

This kernel keeps NOTHING per-ring resident: both operands stream from
HBM in tiles, so the only VMEM footprint is O(tile) and the eligible
shape space is unbounded in nparts (and in bins up to the lane budget).
The price is re-reading the operand windows once per 8-block group —
the sliding windows of 8 consecutive outputs overlap in all but 8 rows,
so per-block HBM traffic is ~(4 planes)/8 = nparts*bins*2 bytes, an 8x
reduction over any per-block path, with VMEM usage independent of
nparts.

LTI form (same math as chunkmac / the reference ``convol`` kernel,
cl_conv_kernels.h:102-118):

    acc[t] = sum_q  Xtl[t + q] (*) h[q]

TV form (the closed form of the reference's dual-ring walk, derived and
test-pinned in ops/decomposed.py; c = (np-1-wp2) mod np is the
coefficient-ring phase):

    acc[t] = sum over a in [t-np+1, t] of  X_a (*) H_{b(a,t)}
    b(a, t) = t - ((a + c) mod np)

The kernel tiles the sum over ``a`` on a T-grid (T | np) aligned so the
(a + c) mod np term never wraps inside a tile: for tile rows read
DESCENDING in ``a`` (i.e. ascending rows of the REVERSED X timeline),
the H partner rows are one contiguous ascending window whose per-output
shift is the group offset g. Outputs of one group share each tile read.

Measured kernel-body findings (r4 ablations, (2048, 512) on-chip,
interleaved):
  * the MXU ones-vector row reduction — chunkmac v3's winner at one dot
    per GROUP — LOSES badly here at one dot per TILE: an M=1 dot is
    bound by rhs tile loads (~4 us/dot), 19.9 us/block vs 9.6 for a VPU
    reduce. Small-M dots only pay off when K spans the whole window.
  * a per-g (T, bins) product + axis-0 VPU sum beats the stacked
    (GB, T, bins) jnp.sum form and improves with larger tiles:
    8.66 us/block at T=512 vs 10.7 at T=128.
  * blocking DMA alone costs ~3.8 us/block — hidden behind compute by
    the 2-slot prefetch pipeline below (each program starts the next
    program's copies before computing).

Index algebra (verified row-exact by tests/test_decomposed.py):
  group t0 = gb*j;  delta = (t0+1+c) mod T;  a0 = t0 - np + 1 - delta + iT
  X rows:   XtlR[xs + k] = X_{a0+T-1-k},  xs = nbp + T - a0
            (XtlR = flip of [T zero rows | np-1 old | nbp fresh | 2T zero])
  H rows:   hbuf[m] = Htl[hb0 + m], hb0 = t0 + np - ((a0+c) mod np) - T
            (Htl row(f) = f + np - 1; rows [0, np-1) = pre-scan ring
             time-ordered, then fresh frames, then >= 9 zero rows)
  pairing:  xbuf[k] (*) hbuf[k + g]   for output t0 + g
  validity: the a-window [t-np+1, t] as general per-tile thresholds on
            m = k + g:  (i+1)T - np - delta <= m <= (i+1)T - 1 - delta
            (ntiles = np/T + 2 so the window may straddle any tiles —
            required for gb > 8, where delta + g can exceed T).

All DMA row offsets (xs, hb0) are 8-aligned by construction given
c ≡ 0 (mod 8) — t0, T, nbp, np are multiples of 8 and a0 ≡ -c (mod T).
ops.decomposed guards the phase with a lax.cond. Bin 0 carries the
packed (DC, Nyq) pair and multiplies componentwise scaled by b0
(cl_conv_kernels.h:114-115) via three column-0-adjusted h views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

_VMEM_LIMIT = 100 * 1024 * 1024
_GB = 8           # minimum outputs per group (DMA row-alignment unit)


# Measured scoped-VMEM envelope for the gb=32 body (tools/macflow_smoke
# + the r4 sweep): live rows ~= 4T (x bufs) + 7(T+gb) (h bufs + the 3
# column-adjusted variants) + 2*gb*T (the unrolled per-group products)
# + 16. Model vs chip: (8192, T=32, gb=32) -> 86.5 MB modeled, compiles;
# (32768, T=8, gb=32) -> 110 MB modeled, 107.8 MB actual scoped OOM at
# the 100 MB limit. 90 MB sits between the measured pass and fail.
_GROUP_ENVELOPE = 90 * 1024 * 1024


def _model_bytes(T: int, gb: int, bins: int) -> int:
    return (4 * T + 7 * (T + gb) + 2 * gb * T + 16) * bins * 4


def pick_group(nb: int, T: int, bins: int) -> int:
    """Outputs per group: window re-reads scale 1/gb while VPU work is
    gb-independent, so long scans take gb=32 (measured at (8192,512):
    24.45 -> 19.10 us/block vs gb=8); short chunks (the K=8 serving
    path) keep gb=8 — a larger group would pad nbp with wasted compute.
    Huge bins also keep gb=8: the unrolled gb=32 body's live set blows
    the scoped-VMEM limit (see _GROUP_ENVELOPE).

    HARD geometric bound gb <= T: the TV kernels' ntiles = np/T + 2
    tile sweep covers group offsets only up to delta + g <= 2T, so a
    group wider than the tile silently drops the most-recent partitions
    for outputs past 2T - delta (caught by review at T=8, bins=16384:
    outputs 16..31 of each 32-group wrong by O(1))."""
    gb = 32 if nb >= 64 else _GB
    while gb > _GB and (gb > T or _model_bytes(T, gb, bins)
                        > _GROUP_ENVELOPE):
        gb //= 2
    return gb

# Live-buffer cost model: 2 slots x 4 operand buffers of (T+8, bins) f32
# plus ~6 (T, bins) body temporaries -> (14 T + 64) * bins * 4 bytes.
# 16 MB gives T=512 at bins=512 (the measured best), 128 at bins=2048.
_TILE_BUDGET = 16 * 1024 * 1024
_TILE_MIN_CEIL = 44 * 1024 * 1024


def pick_tile(nparts: int, bins: int) -> int:
    """Tile rows T: a power-of-two divisor of nparts, >= 8, sized to the
    VMEM budget. Larger T amortizes per-tile edge reads and improves the
    VPU reduction (measured: 8.66 us/block at T=512 vs 10.7 at T=128,
    (2048, 512))."""
    t = (_TILE_BUDGET // (4 * bins) - 64) // 14
    if t < 8:
        return 8 if (14 * 8 + 64) * bins * 4 <= _TILE_MIN_CEIL else 0
    p = 8
    while p * 2 <= t:
        p *= 2
    return min(nparts, p)


def fits_macflow(nparts: int, bins: int) -> bool:
    """Eligibility: nparts a multiple of 8 with a usable tile size, bins
    lane-aligned. Unlike every resident-state kernel there is no nparts
    ceiling — VMEM use is O(tile)."""
    if nparts < 8 or nparts % 8 or bins % 128:
        return False
    if nparts & (nparts - 1):       # T | np relies on pow2 nparts
        return False
    return pick_tile(nparts, bins) >= 8


def _nbp(nb: int, gb: int) -> int:
    return -(-nb // gb) * gb


def _h_variants(hr, hi, b0, shape):
    """Three column-0-adjusted views of an h tile (the chunkmac v3
    recipe): pr = x_r*hrA - x_i*hiZ, pi = x_r*hiZ + x_i*hrB reproduce
    the complex MAC with the componentwise b0-scaled bin 0
    (cl_conv_kernels.h:114-115) — no masks inside the per-g loop.
    col0: hrA = b0*hr, hiZ = 0, hrB = b0*hi -> b0*xr*hr and b0*xi*hi."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col0 = lane == 0
    hra = jnp.where(col0, b0 * hr, hr)
    hiz = jnp.where(col0, 0.0, hi)
    hrb = jnp.where(col0, b0 * hi, hr)
    return hra, hiz, hrb


def _band_mac(xs_r, xs_i, hra, hiz, hrb, gb: int, shift_h: bool):
    """The shared MAC body: 8 shifted (T, bins) complex products, each
    VPU-reduced over rows. shift_h selects which operand carries the
    per-output shift (H for the TV pairing, X for LTI). Returns
    (GB, bins) accumulator rows."""
    T = xs_r.shape[0] if shift_h else xs_r.shape[0] - gb
    rs, is_ = [], []
    for g in range(gb):
        if shift_h:
            xr, xi = xs_r, xs_i
            ra, iz, rb = hra[g:g + T], hiz[g:g + T], hrb[g:g + T]
        else:
            xr, xi = xs_r[g:g + T], xs_i[g:g + T]
            ra, iz, rb = hra, hiz, hrb
        pr = xr * ra - xi * iz
        pi = xr * iz + xi * rb
        rs.append(jnp.sum(pr, axis=0, keepdims=True))
        is_.append(jnp.sum(pi, axis=0, keepdims=True))
    return jnp.concatenate(rs, axis=0), jnp.concatenate(is_, axis=0)


# ---------------------------------------------------------------------------
# LTI kernel
# ---------------------------------------------------------------------------

def _lti_kernel(np_, bins, T, ntiles, gb, b0,
                xr_ref, xi_ref, hr_ref, hi_ref,
                or_ref, oi_ref,
                xr_s, xi_s, sems):
    """Per (group j, tile i) program: the (T+8, bins) x-window tile
    streams through a 2-slot prefetch pipeline (each program starts the
    NEXT program's copies before computing); the (T, bins) h tile rides
    pallas's own pipelined BlockSpec."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    ngroups = pl.num_programs(0)
    prog = j * ntiles + i
    slot = jax.lax.rem(prog, 2)

    def copies(jj, ii, sl):
        row0 = pl.multiple_of(jj * gb + ii * T, 8)
        return [
            pltpu.make_async_copy(xr_ref.at[pl.ds(row0, T + gb), :],
                                  xr_s.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(xi_ref.at[pl.ds(row0, T + gb), :],
                                  xi_s.at[sl], sems.at[sl, 1]),
        ]

    @pl.when(prog == 0)
    def _first():
        for cp in copies(j, i, slot):
            cp.start()

    for cp in copies(j, i, slot):
        cp.wait()

    @pl.when(prog + 1 < ngroups * ntiles)
    def _prefetch():
        last = i == ntiles - 1
        jn = jnp.where(last, j + 1, j)
        in_ = jnp.where(last, 0, i + 1)
        for cp in copies(jn, in_, 1 - slot):
            cp.start()

    hra, hiz, hrb = _h_variants(hr_ref[:], hi_ref[:], b0, (T, bins))
    red_r, red_i = _band_mac(xr_s[slot], xi_s[slot], hra, hiz, hrb,
                             gb, shift_h=False)

    @pl.when(i == 0)
    def _init():
        or_ref[:] = red_r
        oi_ref[:] = red_i

    @pl.when(i > 0)
    def _acc():
        or_ref[:] += red_r
        oi_ref[:] += red_i


def macflow_lti(xtl: Cplx, h: Cplx, nb: int, b0: float,
                interpret: bool = False) -> Cplx:
    """acc[t] = sum_q xtl[t+q] (*) h[q] for t < nbp (caller slices [:nb]).

    xtl: split (np-1+nb, bins) frame timeline (np-1 prior ring frames in
    ascending time order, then the nb fresh frame spectra); h: split
    (np, bins) coefficient frames in ring order.
    """
    xr, xi = xtl
    hr, hi = h
    np_, bins = hr.shape
    T = pick_tile(np_, bins)
    gb = pick_group(nb, T, bins)
    nbp = _nbp(nb, gb)
    ntiles = np_ // T
    # trailing pad: the last group's last tile DMAs up to row
    # (nbp-gb) + (np-T) + T+gb-1 = np+nbp-1; base rows np-1+nb
    rows = np_ + nbp + gb
    pad = rows - xr.shape[0]
    xr = jnp.pad(xr, ((0, pad), (0, 0)))
    xi = jnp.pad(xi, ((0, pad), (0, 0)))

    kern = functools.partial(_lti_kernel, np_, bins, T, ntiles, gb,
                             float(b0))
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(nbp // gb, ntiles),
        out_shape=(
            jax.ShapeDtypeStruct((nbp, bins), jnp.float32),
            jax.ShapeDtypeStruct((nbp, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x timeline re
            pl.BlockSpec(memory_space=pltpu.ANY),       # x timeline im
            pl.BlockSpec((T, bins), lambda j, i: (i, 0)),   # h tile re
            pl.BlockSpec((T, bins), lambda j, i: (i, 0)),   # h tile im
        ],
        out_specs=(
            pl.BlockSpec((gb, bins), lambda j, i: (j, 0)),
            pl.BlockSpec((gb, bins), lambda j, i: (j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xr, xi, hr, hi)
    return out_r, out_i


# ---------------------------------------------------------------------------
# Batched (multi-channel serving) LTI kernel: leading channel grid dim,
# per-channel timelines/coefficients — the wide-serving regime chunkmac's
# resident shifted stacks cannot reach (its VMEM is O(nparts * gb)) and
# where its per-program window DMAs contend above ~16 channels.
# ---------------------------------------------------------------------------

def _lti_batched_kernel(np_, bins, T, ntiles, gb, b0,
                        xr_ref, xi_ref, hr_ref, hi_ref,
                        or_ref, oi_ref,
                        xr_s, xi_s, sems):
    """(channel b, group j, tile i) program — the single-stream LTI body
    with every HBM access indexed by the channel grid dim."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    nch = pl.num_programs(0)
    ngroups = pl.num_programs(1)
    prog = (b * ngroups + j) * ntiles + i
    slot = jax.lax.rem(prog, 2)

    def copies(bb, jj, ii, sl):
        row0 = pl.multiple_of(jj * gb + ii * T, 8)
        return [
            pltpu.make_async_copy(xr_ref.at[bb, pl.ds(row0, T + gb), :],
                                  xr_s.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(xi_ref.at[bb, pl.ds(row0, T + gb), :],
                                  xi_s.at[sl], sems.at[sl, 1]),
        ]

    @pl.when(prog == 0)
    def _first():
        for cp in copies(b, j, i, slot):
            cp.start()

    for cp in copies(b, j, i, slot):
        cp.wait()

    @pl.when(prog + 1 < nch * ngroups * ntiles)
    def _prefetch():
        last_t = i == ntiles - 1
        last_g = last_t & (j == ngroups - 1)
        bn = jnp.where(last_g, b + 1, b)
        jn = jnp.where(last_g, 0, jnp.where(last_t, j + 1, j))
        in_ = jnp.where(last_t, 0, i + 1)
        for cp in copies(bn, jn, in_, 1 - slot):
            cp.start()

    hra, hiz, hrb = _h_variants(hr_ref[0], hi_ref[0], b0, (T, bins))
    red_r, red_i = _band_mac(xr_s[slot], xi_s[slot], hra, hiz, hrb,
                             gb, shift_h=False)

    @pl.when(i == 0)
    def _init():
        or_ref[0] = red_r
        oi_ref[0] = red_i

    @pl.when(i > 0)
    def _acc():
        or_ref[0] += red_r
        oi_ref[0] += red_i


def macflow_lti_batched(xtl: Cplx, h: Cplx, nb: int, b0: float,
                        interpret: bool = False) -> Cplx:
    """Per-channel LTI sliding MAC: acc[c, t] = sum_q xtl[c, t+q] (*)
    h[c, q]. xtl: split (B, np-1+nb, bins); h: split (B, np, bins).
    Returns split (B, nbp, bins) (caller slices [:, :nb])."""
    xr, xi = xtl
    hr, hi = h
    nch, np_, bins = hr.shape
    T = pick_tile(np_, bins)
    gb = pick_group(nb, T, bins)
    nbp = _nbp(nb, gb)
    ntiles = np_ // T
    rows = np_ + nbp + gb
    pad = rows - xr.shape[1]
    xr = jnp.pad(xr, ((0, 0), (0, pad), (0, 0)))
    xi = jnp.pad(xi, ((0, 0), (0, pad), (0, 0)))

    kern = functools.partial(_lti_batched_kernel, np_, bins, T, ntiles,
                             gb, float(b0))
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(nch, nbp // gb, ntiles),
        out_shape=(
            jax.ShapeDtypeStruct((nch, nbp, bins), jnp.float32),
            jax.ShapeDtypeStruct((nch, nbp, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x timelines
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, T, bins), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, T, bins), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, gb, bins), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, gb, bins), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xr, xi, hr, hi)
    return out_r, out_i


# ---------------------------------------------------------------------------
# TV kernel
# ---------------------------------------------------------------------------

def _tv_kernel(np_, bins, T, ntiles, nbp, gb, b0,
               c_ref, xr_ref, xi_ref, hr_ref, hi_ref,
               or_ref, oi_ref,
               xr_s, xi_s, hr_s, hi_s, sems):
    """Per (group j, tile i) program — see the module docstring for the
    index algebra. x rows arrive from the REVERSED timeline; the per-g
    shift and the first/last-tile validity masks land on the h window.
    All four operand streams ride the 2-slot prefetch pipeline."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    ngroups = pl.num_programs(0)
    c = c_ref[0]
    prog = j * ntiles + i
    slot = jax.lax.rem(prog, 2)

    def offsets(jj, ii):
        t0 = jj * gb
        delta = (t0 + 1 + c) % T
        a0 = t0 - np_ + 1 - delta + ii * T
        xs = pl.multiple_of(nbp + T - a0, 8)
        hb0 = pl.multiple_of(t0 + np_ - ((a0 + c) % np_) - T, 8)
        return xs, hb0, delta

    def copies(jj, ii, sl):
        xs, hb0, _ = offsets(jj, ii)
        return [
            pltpu.make_async_copy(xr_ref.at[pl.ds(xs, T), :],
                                  xr_s.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(xi_ref.at[pl.ds(xs, T), :],
                                  xi_s.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(hr_ref.at[pl.ds(hb0, T + gb), :],
                                  hr_s.at[sl], sems.at[sl, 2]),
            pltpu.make_async_copy(hi_ref.at[pl.ds(hb0, T + gb), :],
                                  hi_s.at[sl], sems.at[sl, 3]),
        ]

    @pl.when(prog == 0)
    def _first():
        for cp in copies(j, i, slot):
            cp.start()

    for cp in copies(j, i, slot):
        cp.wait()

    @pl.when(prog + 1 < ngroups * ntiles)
    def _prefetch():
        last = i == ntiles - 1
        jn = jnp.where(last, j + 1, j)
        in_ = jnp.where(last, 0, i + 1)
        for cp in copies(jn, in_, 1 - slot):
            cp.start()

    _, _, delta = offsets(j, i)
    # a-window validity as general per-tile thresholds on the h-window
    # index m = k + g: valid u = a - amin in [delta+g, delta+g+np-1]
    # with u = iT + T-1-k  =>  (i+1)T - np - delta <= m <= (i+1)T-1-delta.
    # (Special-casing first/last tiles only works at gb = 8, where the
    # mod-8 phase alignment makes delta + g <= T exactly tight.)
    m_io = jax.lax.broadcasted_iota(jnp.int32, (T + gb, bins), 0)
    hi_thr = (i + 1) * T - 1 - delta
    lo_thr = (i + 1) * T - np_ - delta
    keep = (m_io <= hi_thr) & (m_io >= lo_thr)
    hr = jnp.where(keep, hr_s[slot], 0.0)          # (T+8, bins)
    hi_ = jnp.where(keep, hi_s[slot], 0.0)
    hra, hiz, hrb = _h_variants(hr, hi_, b0, (T + gb, bins))

    red_r, red_i = _band_mac(xr_s[slot], xi_s[slot], hra, hiz, hrb,
                             gb, shift_h=True)

    @pl.when(i == 0)
    def _init():
        or_ref[:] = red_r
        oi_ref[:] = red_i

    @pl.when(i > 0)
    def _acc():
        or_ref[:] += red_r
        oi_ref[:] += red_i


def macflow_tv(xtl: Cplx, htl: Cplx, nb: int, np_: int, b0: float,
               c=0, interpret: bool = False) -> Cplx:
    """TV sliding MAC over both frame timelines; returns (nbp, bins)
    accumulators (caller slices [:nb]).

    xtl / htl: split (np-1+nb, bins) timelines, row(f) = f + np - 1 —
    rows [0, np-1) are the pre-scan ring contents in the pairing's time
    order (built by ops.decomposed), then the nb fresh frame spectra.
    c: the coefficient-ring phase (np-1 - wp2) mod np — MUST be ≡ 0
    (mod 8) at runtime (DMA row alignment; ops.decomposed guards this
    with a lax.cond).
    """
    xr, xi = xtl
    htl_r, htl_i = htl
    bins = xr.shape[1]
    T = pick_tile(np_, bins)
    gb = pick_group(nb, T, bins)
    nbp = _nbp(nb, gb)
    # one tile beyond np/T + 1: the general masks let the valid window
    # straddle up to ntiles partial tiles for any gb <= T
    ntiles = np_ // T + 2

    # X: [T zeros | np-1 old | nbp fresh | 2T zeros], flipped. Total
    # rows np-1+nbp+3T; xs = nbp + T - a0 spans the padded range.
    padf = nbp - nb
    xr_p = jnp.pad(xr, ((T, 2 * T + padf), (0, 0)))
    xi_p = jnp.pad(xi, ((T, 2 * T + padf), (0, 0)))
    xr_rev = jnp.flip(xr_p, axis=0)
    xi_rev = jnp.flip(xi_p, axis=0)

    # H: base rows + >= 9 trailing zeros (max read row t0+np+7 =
    # np+nbp-1 over total np-1+nbp+9)
    hpad = (np_ - 1 + nbp + 9) - htl_r.shape[0]
    hr_p = jnp.pad(htl_r, ((0, hpad), (0, 0)))
    hi_p = jnp.pad(htl_i, ((0, hpad), (0, 0)))

    kern = functools.partial(_tv_kernel, np_, bins, T, ntiles, nbp, gb,
                             float(b0))
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(nbp // gb, ntiles),
        out_shape=(
            jax.ShapeDtypeStruct((nbp, bins), jnp.float32),
            jax.ShapeDtypeStruct((nbp, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # phase c
            pl.BlockSpec(memory_space=pltpu.ANY),   # reversed x timeline
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),   # h timeline
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((gb, bins), lambda j, i: (j, 0)),
            pl.BlockSpec((gb, bins), lambda j, i: (j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, T, bins), jnp.float32),
            pltpu.VMEM((2, T, bins), jnp.float32),
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(c, jnp.int32).reshape(1), xr_rev, xi_rev, hr_p, hi_p)
    return out_r, out_i


def _tv_batched_kernel(np_, bins, T, ntiles, nbp, gb, b0,
                       c_ref, xr_ref, xi_ref, hr_ref, hi_ref,
                       or_ref, oi_ref,
                       xr_s, xi_s, hr_s, hi_s, sems):
    """(channel b, group j, tile i) program — the single-stream TV body
    with every HBM access indexed by the channel grid dim (timelines are
    per-channel; the ring-pointer phase c is shared, as in the
    batched_state layout)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    nch = pl.num_programs(0)
    ngroups = pl.num_programs(1)
    c = c_ref[0]
    prog = (b * ngroups + j) * ntiles + i
    slot = jax.lax.rem(prog, 2)

    def offsets(jj, ii):
        t0 = jj * gb
        delta = (t0 + 1 + c) % T
        a0 = t0 - np_ + 1 - delta + ii * T
        xs = pl.multiple_of(nbp + T - a0, 8)
        hb0 = pl.multiple_of(t0 + np_ - ((a0 + c) % np_) - T, 8)
        return xs, hb0, delta

    def copies(bb, jj, ii, sl):
        xs, hb0, _ = offsets(jj, ii)
        return [
            pltpu.make_async_copy(xr_ref.at[bb, pl.ds(xs, T), :],
                                  xr_s.at[sl], sems.at[sl, 0]),
            pltpu.make_async_copy(xi_ref.at[bb, pl.ds(xs, T), :],
                                  xi_s.at[sl], sems.at[sl, 1]),
            pltpu.make_async_copy(hr_ref.at[bb, pl.ds(hb0, T + gb), :],
                                  hr_s.at[sl], sems.at[sl, 2]),
            pltpu.make_async_copy(hi_ref.at[bb, pl.ds(hb0, T + gb), :],
                                  hi_s.at[sl], sems.at[sl, 3]),
        ]

    @pl.when(prog == 0)
    def _first():
        for cp in copies(b, j, i, slot):
            cp.start()

    for cp in copies(b, j, i, slot):
        cp.wait()

    @pl.when(prog + 1 < nch * ngroups * ntiles)
    def _prefetch():
        last_t = i == ntiles - 1
        last_g = last_t & (j == ngroups - 1)
        bn = jnp.where(last_g, b + 1, b)
        jn = jnp.where(last_g, 0, jnp.where(last_t, j + 1, j))
        in_ = jnp.where(last_t, 0, i + 1)
        for cp in copies(bn, jn, in_, 1 - slot):
            cp.start()

    _, _, delta = offsets(j, i)
    m_io = jax.lax.broadcasted_iota(jnp.int32, (T + gb, bins), 0)
    hi_thr = (i + 1) * T - 1 - delta
    lo_thr = (i + 1) * T - np_ - delta
    keep = (m_io <= hi_thr) & (m_io >= lo_thr)
    hr = jnp.where(keep, hr_s[slot], 0.0)
    hi_ = jnp.where(keep, hi_s[slot], 0.0)
    hra, hiz, hrb = _h_variants(hr, hi_, b0, (T + gb, bins))

    red_r, red_i = _band_mac(xr_s[slot], xi_s[slot], hra, hiz, hrb,
                             gb, shift_h=True)

    @pl.when(i == 0)
    def _init():
        or_ref[0] = red_r
        oi_ref[0] = red_i

    @pl.when(i > 0)
    def _acc():
        or_ref[0] += red_r
        oi_ref[0] += red_i


def macflow_tv_batched(xtl: Cplx, htl: Cplx, nb: int, np_: int, b0: float,
                       c=0, interpret: bool = False) -> Cplx:
    """Per-channel TV sliding MAC: xtl / htl split (B, np-1+nb, bins)
    timelines (layout as macflow_tv, per channel; the phase c is shared
    across channels). Returns split (B, nbp, bins)."""
    xr, xi = xtl
    htl_r, htl_i = htl
    nch, _, bins = xr.shape
    T = pick_tile(np_, bins)
    gb = pick_group(nb, T, bins)
    nbp = _nbp(nb, gb)
    ntiles = np_ // T + 2

    padf = nbp - nb
    xr_rev = jnp.flip(jnp.pad(xr, ((0, 0), (T, 2 * T + padf), (0, 0))),
                      axis=1)
    xi_rev = jnp.flip(jnp.pad(xi, ((0, 0), (T, 2 * T + padf), (0, 0))),
                      axis=1)
    hpad = (np_ - 1 + nbp + 9) - htl_r.shape[1]
    hr_p = jnp.pad(htl_r, ((0, 0), (0, hpad), (0, 0)))
    hi_p = jnp.pad(htl_i, ((0, 0), (0, hpad), (0, 0)))

    kern = functools.partial(_tv_batched_kernel, np_, bins, T, ntiles,
                             nbp, gb, float(b0))
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(nch, nbp // gb, ntiles),
        out_shape=(
            jax.ShapeDtypeStruct((nch, nbp, bins), jnp.float32),
            jax.ShapeDtypeStruct((nch, nbp, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # phase c
            pl.BlockSpec(memory_space=pltpu.ANY),   # reversed x timelines
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),   # h timelines
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, gb, bins), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, gb, bins), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, T, bins), jnp.float32),
            pltpu.VMEM((2, T, bins), jnp.float32),
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.VMEM((2, T + gb, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(c, jnp.int32).reshape(1), xr_rev, xi_rev, hr_p, hi_p)
    return out_r, out_i
