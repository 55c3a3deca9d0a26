"""Half-table factorization of the fused block-step transform chain.

The grid-streamed kernels (streamstep.py) apply the forward rFFT chain
and the inverse unpack/IDFT/deinterleave/OLA chain as two dense table
matmuls: wfwd (m, 2m) and wpost (2m, 2m) — 6 m^2 floats of VMEM
(blockstep._wfwd_np / _wpost_np). At bins = 2048 that is ~100 MB, which
is what keeps the whole M=2048 benchmark row off the kernels.

This module factors BOTH chains through a single (m, m) table:

    ctab[k, q] = cos(2*pi*(q//2)*k/m)   for q even
                 sin(2*pi*(q//2)*k/m)   for q odd

using three identities (all verified against the dense tables in
tests/test_splitstep.py):

  * deinterleave folds into the table columns: the half-size IDFT output
    z_j lands at time samples t_{2j} = Re z_j, t_{2j+1} = Im z_j, so
    contracting against interleaved-column cos/sin tables emits the time
    block directly;
  * the second output half multiplies Z_k by (-1)^k (omega^{(m/2)k}) —
    an elementwise prescale, not a new table;
  * the pack/unpack flip (bin k -> m-k) commutes through the DFT as a
    parity sign: C[(m-k) mod m, q] = +-C[k, q] with - on odd q — so
    every flip becomes a precomputed coefficient vector;
  * the sin-partner table is the parity-swapped ctab: S[:, 2j] =
    -ctab[:, 2j+1], S[:, 2j+1] = ctab[:, 2j] — one lane roll each way
    plus a parity select, not a second m^2 table.

Net: 1 m^2 table + O(m) vectors, with the SAME MXU work (6 m^2 MACs per
block) as the two dense-table matmuls it replaces.

Reference chain being reproduced: forward rFFT + pack (cl_fft.cpp
conventions via ops/rfft.py) and unpack + inverse + overlap-add
(cl_conv.cpp:393-458), both bit-matched through blockstep._wfwd_np /
_wpost_np which the tests pin against.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def ctab_np(m: int) -> np.ndarray:
    """(m, m) table: cos(2*pi*j*k/m) in column q=2j, sin(...) in column
    q=2j+1 (f64 trig, cast f32 — same accuracy recipe as the dense
    tables)."""
    k = np.arange(m, dtype=np.float64)[:, None]
    j = (np.arange(m, dtype=np.float64)[None, :] // 2)
    ang = 2.0 * np.pi * j * k / m
    tab = np.where(np.arange(m)[None, :] % 2 == 0, np.cos(ang), np.sin(ang))
    return tab.astype(np.float32)


def _diag_flip_coeffs(block: np.ndarray):
    """Extract (d1, d2) with block == diag(d1) + P @ diag(d2), where P is
    the index-negation permutation (row (m-k)%m, col k). At k = 0 and
    k = m/2 the two structures coincide; the full weight goes to d1."""
    m = block.shape[0]
    k = np.arange(m)
    d1 = block[k, k].copy()
    d2 = block[(m - k) % m, k].copy()
    coincide = (k == (m - k) % m)
    d2[coincide] = 0.0
    # verify the decomposition is exact (the pack/unpack matrices are
    # 2-sparse per column by construction)
    rec = np.diag(d1)
    rec[(m - k) % m, k] += d2
    if not np.allclose(rec, block, atol=0.0):
        raise ValueError("matrix is not diag + flip*diag")
    return d1, d2


@functools.lru_cache(maxsize=None)
def pack_coeffs_np(m: int, forward: bool):
    """The pack/unpack pass [re|im] @ U as 8 length-m coefficient
    vectors: out_re = re*a1 + nflip(re)*a2 + im*b1 + nflip(im)*b2,
    out_im = re*c1 + nflip(re)*c2 + im*d1 + nflip(im)*d2, with nflip the
    index negation v_k -> v_{(m-k)%m}."""
    from .blockstep import _pack_matrix_np
    u = _pack_matrix_np(m, forward)
    a_rr, a_ri = u[:m, :m], u[:m, m:]
    a_ir, a_ii = u[m:, :m], u[m:, m:]
    return (_diag_flip_coeffs(a_rr), _diag_flip_coeffs(a_ir),
            _diag_flip_coeffs(a_ri), _diag_flip_coeffs(a_ii))


def _nflip(v):
    """Index negation along the last axis: v_k -> v_{(m-k) % m}."""
    import jax.numpy as jnp
    return jnp.roll(jnp.flip(v, axis=-1), 1, axis=-1)


def _apply_pack(re, im, coeffs):
    """[re|im] @ U via the 8 coefficient vectors (see pack_coeffs_np)."""
    import jax.numpy as jnp
    (a1, a2), (b1, b2), (c1, c2), (d1, d2) = [
        (jnp.asarray(x), jnp.asarray(y)) for x, y in coeffs]
    fr, fi = _nflip(re), _nflip(im)
    out_r = re * a1 + fr * a2 + im * b1 + fi * b2
    out_i = re * c1 + fr * c2 + im * d1 + fi * d2
    return out_r, out_i


def fwd_ref(block, m: int):
    """JAX reference of the factored forward chain == block @ wfwd.

    block: (..., m) time samples. Returns (re, im) packed spectra
    (..., m). Structure: the interleaved-row DFT is ctab^T on the even/
    odd-prescaled block; the pack pass is elementwise."""
    import jax.numpy as jnp
    c = jnp.asarray(ctab_np(m))
    x = jnp.asarray(block)
    # fr = x @ C^T ; fi = parity_swap'(x) @ C^T with the odd lanes
    # negated (see module docstring: Fi columns are the parity-swapped,
    # sign-fixed Fr columns)
    even = (jnp.arange(m) % 2) == 0
    xs = jnp.where(even, jnp.roll(x, m - 1, axis=-1),
                   -jnp.roll(x, 1, axis=-1))
    fr = x @ c.T
    fi = xs @ c.T
    return _apply_pack(fr, fi, pack_coeffs_np(m, True))


def inv_ref(acc_r, acc_i, m: int):
    """JAX reference of the factored inverse chain ==
    [acc_r|acc_i] @ wpost -> (first_half, second_half) time samples.

    Unpack is elementwise (pack_coeffs_np(m, False)); the IDFT +
    deinterleave contracts against ctab; the second output half
    prescales Z by (-1)^k."""
    import jax.numpy as jnp
    c = jnp.asarray(ctab_np(m))
    zr, zi = _apply_pack(acc_r, acc_i, pack_coeffs_np(m, False))
    alt = jnp.where((jnp.arange(m) % 2) == 0, 1.0, -1.0).astype(zr.dtype)

    def idft_deint(vr, vi):
        # t = Re/Im-interleave of sum_k (vr + i vi)_k omega^{jk}
        #   = vr @ ctab + vi @ S with S = parity-swapped, sign-fixed ctab;
        # push the parity swap onto the OUTPUT of vi @ ctab.
        a = vr @ c
        b = vi @ c
        even = (jnp.arange(m) % 2) == 0
        sw = jnp.where(even, -jnp.roll(b, m - 1, axis=-1),
                       jnp.roll(b, 1, axis=-1))
        return a + sw

    out1 = idft_deint(zr, zi)
    out2 = idft_deint(zr * alt, zi * alt)
    return out1, out2


# ---------------------------------------------------------------------------
# The whole-scan grid kernel on the factored tables
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

_VMEM_LIMIT = 100 * 1024 * 1024
# one shared blocks-per-grid-step constant: the pconv wrappers compute
# the kernel-covered prefix (nb_k) from streamstep's value and hand
# those blocks to either kernel family
from .streamstep import _STEP_GROUP  # noqa: E402


def _split_budget(nparts: int, bins: int, planes: int) -> int:
    tables = 2 * bins * bins * 4                 # ctab + ctab^T
    coefs = 2 * 8 * bins * 4                     # fwd + inv stacks
    # per-step I/O + scratch rows: blocks in (<= 2G), out (G), accs (2G)
    rows = 5 * _STEP_GROUP * bins * 4
    return tables + coefs + rows + planes * nparts * bins * 4


# Measured compile envelope on the state-plane axis (rows x bins x 4 f32)
# per tools/vmem_probe.py — see streamstep._PLANE_PASS_MAX for the full
# rationale (Mosaic's true footprint is 2-3.5x the naive plane models).
_SPLIT_PLANE_PASS_MAX = {
    "split_lti": 1024 * 2048 * 4,   # pass; 2048x2048 compile fails
    "split_tv": 512 * 2048 * 4,     # pass; 1024x2048 compile fails
}


def fits_vmem_splitstep(nparts: int, bins: int) -> bool:
    """VMEM gate for the factored LTI kernel. Two measured bounds
    (tools/vmem_probe.py): the naive model — ctab + ctab^T (2 bins^2
    f32) + 8 resident (nparts, bins) planes + coefficient stacks and
    per-step rows — at most the largest value that COMPILED on-chip
    ((1024, 2048): 101 MB naive), which bounds the tables axis jointly
    with the planes; and the state-plane bytes within the measured
    envelope. The factored tables are what make bins = 2048
    kernel-eligible at all: the dense-table budget (6 bins^2) is
    ~100 MB there."""
    if nparts < 8 or bins % 128:
        return False
    plane = nparts * bins * 4
    return (_split_budget(nparts, bins, 8) <= 101 * 1024 * 1024
            and plane <= _SPLIT_PLANE_PASS_MAX["split_lti"])


def fits_vmem_splitstep_tv(nparts: int, bins: int) -> bool:
    """TV variant: the h ring streams too — 12 resident planes; naive
    cap at the largest measured-PASS value ((512, 2048): 84.2 MB naive)
    and a plane envelope one doubling tighter than the LTI kernel's."""
    if not fits_vmem_splitstep(nparts, bins):
        return False
    plane = nparts * bins * 4
    return (_split_budget(nparts, bins, 12) <= 85 * 1024 * 1024
            and plane <= _SPLIT_PLANE_PASS_MAX["split_tv"])


@functools.lru_cache(maxsize=None)
def _coef_stacks_np(m: int):
    """(8, m) forward and (8, m) inverse coefficient stacks.

    fwd rows: [a1, a2, b1, b2, c1, c2, d1, d2] with
      packed_re = FR*a1 + GR*a2 + FI*b1 + GI*b2
      packed_im = FR*c1 + GR*c2 + FI*d1 + GI*d2
    where FR/FI are the DFT of the block / its parity-swap and GR/GI the
    same with odd lanes negated (they equal nflip(FR)/nflip(FI)).

    inv rows: [a1, b1, na2, nb2, c1, d1, nc2, nd2] with
      A = accR*a1 + accI*b1     B = accR*na2 + accI*nb2
      D = accR*c1 + accI*d1     E = accR*nc2 + accI*nd2
    (n* = index-negated vectors: the unpack flip pushed through the IDFT
    as a parity sign on the output)."""
    (fa1, fa2), (fb1, fb2), (fc1, fc2), (fd1, fd2) = pack_coeffs_np(m, True)
    fwd = np.stack([fa1, fa2, fb1, fb2, fc1, fc2, fd1, fd2]).astype(np.float32)
    (ia1, ia2), (ib1, ib2), (ic1, ic2), (id1, id2) = pack_coeffs_np(m, False)

    def nf(v):
        return np.roll(v[::-1], 1)

    inv = np.stack([ia1, ib1, nf(ia2), nf(ib2),
                    ic1, id1, nf(ic2), nf(id2)]).astype(np.float32)
    return fwd, inv


def _split_tables(m: int):
    c = ctab_np(m)
    fwd, inv = _coef_stacks_np(m)
    return (jnp.asarray(c), jnp.asarray(c.T.copy()),
            jnp.asarray(fwd), jnp.asarray(inv))


def _pm(m, dtype=jnp.float32):
    """Lane parity sign vector (+1 even lane, -1 odd)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    return jnp.where(lane % 2 == 0, 1.0, -1.0).astype(dtype)


def _psw_neg(x, m):
    """Forward input prescale: x'_q = x_{q+1} (q even), -x_{q-1} (q odd)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane % 2 == 0, pltpu.roll(x, m - 1, 1),
                     -pltpu.roll(x, 1, 1))


def _sw(b, m):
    """Inverse output combine: sw(b)_q = -b_{q+1} (q even), b_{q-1} (odd)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    return jnp.where(lane % 2 == 0, -pltpu.roll(b, m - 1, 1),
                     pltpu.roll(b, 1, 1))


def _fwd_spectra(blk, ctt_ref, fcoef_ref, m, hp):
    """Packed forward spectra of a (R, m) group of blocks: one
    (4R, m) x (m, m) matmul against ctab^T plus elementwise pack."""
    pm = _pm(m, blk.dtype)
    xs = _psw_neg(blk, m)
    x4 = jnp.concatenate([blk, xs, blk * pm, xs * pm], axis=0)
    f = jax.lax.dot(x4, ctt_ref[:], precision=hp)          # (4R, m)
    r = blk.shape[0]
    fr_, fi_, gr_, gi_ = f[:r], f[r:2 * r], f[2 * r:3 * r], f[3 * r:]
    fc = fcoef_ref[:]
    fre = (fr_ * fc[0:1] + gr_ * fc[1:2] + fi_ * fc[2:3] + gi_ * fc[3:4])
    fim = (fr_ * fc[4:5] + gr_ * fc[5:6] + fi_ * fc[6:7] + gi_ * fc[7:8])
    return fre, fim


def _inverse_ola(accr, acci, ct_ref, icoef_ref, tl_s, out_ref, m, pts, hp):
    """Unpack + IDFT + deinterleave + OLA for a (G, m) group of MAC
    accumulators: one (8G, m) x (m, m) matmul, elementwise combines, and
    a vectorized tail chain. Writes out_ref and updates tl_s."""
    g = accr.shape[0]
    ic = icoef_ref[:]
    pm = _pm(m, accr.dtype)
    a = accr * ic[0:1] + acci * ic[1:2]
    b = accr * ic[2:3] + acci * ic[3:4]
    d = accr * ic[4:5] + acci * ic[5:6]
    e = accr * ic[6:7] + acci * ic[7:8]
    z8 = jnp.concatenate([a, b, d, e, a * pm, b * pm, d * pm, e * pm],
                         axis=0)
    y = jax.lax.dot(z8, ct_ref[:], precision=hp)           # (8G, m)
    ya, yb = y[:g], y[g:2 * g]
    yd, ye = y[2 * g:3 * g], y[3 * g:4 * g]
    ya2, yb2 = y[4 * g:5 * g], y[5 * g:6 * g]
    yd2, ye2 = y[6 * g:7 * g], y[7 * g:]
    zc_r = ya + yb * pm
    zc_i = yd + ye * pm
    zc2_r = ya2 + yb2 * pm
    zc2_i = yd2 + ye2 * pm
    out1 = zc_r + _sw(zc_i, m)                             # (G, m)
    out2 = zc2_r + _sw(zc2_i, m)
    tails = jnp.concatenate([tl_s[:], out2[:g - 1]], axis=0)
    out_ref[:] = (out1 + tails) / float(pts)
    tl_s[:] = out2[g - 1:g]


def _split_stream_kernel(nparts, bins, b0_scale, pts, nsteps,
                         blk_ref, w0r_ref, w0i_ref, hr_ref, hi_ref,
                         ct_ref, ctt_ref, fcoef_ref, icoef_ref, tail0_ref,
                         out_ref, wfr_ref, wfi_ref, tailf_ref,
                         wr_s, wi_s, ar_s, ai_s, tl_s):
    """LTI whole-scan step on the factored tables. Identical carried
    state and MAC math to streamstep._stream_kernel; only the forward
    and inverse transform chains differ (half-table factorization)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        wr_s[:] = w0r_ref[:]
        wi_s[:] = w0i_ref[:]
        tl_s[:] = tail0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    m = bins
    fre, fim = _fwd_spectra(blk_ref[:], ctt_ref, fcoef_ref, m, hp)

    lastrow = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 0) \
        == nparts - 1
    col0 = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 1) == 0
    hr = hr_ref[:]
    hi = hi_ref[:]

    for g in range(_STEP_GROUP):                   # static unroll
        fr, fi = fre[g:g + 1], fim[g:g + 1]
        wr = jnp.where(lastrow, fr, pltpu.roll(wr_s[:], nparts - 1, 0))
        wi = jnp.where(lastrow, fi, pltpu.roll(wi_s[:], nparts - 1, 0))
        wr_s[:] = wr
        wi_s[:] = wi

        prod_r = wr * hr - wi * hi
        prod_i = wr * hi + wi * hr
        prod_r = jnp.where(col0, b0_scale * wr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * wi * hi, prod_i)
        ar_s[g:g + 1] = jnp.sum(prod_r, axis=0, keepdims=True)
        ai_s[g:g + 1] = jnp.sum(prod_i, axis=0, keepdims=True)

    _inverse_ola(ar_s[:], ai_s[:], ct_ref, icoef_ref, tl_s, out_ref,
                 m, pts, hp)

    @pl.when(j == nsteps - 1)
    def _flush():
        wfr_ref[:] = wr_s[:]
        wfi_ref[:] = wi_s[:]
        tailf_ref[:] = tl_s[:]


def stream_steps_fused_split(blocks, w0: Cplx, h: Cplx, b0_scale: float,
                             tail, pts: int, interpret: bool = False):
    """LTI whole-scan launch on the factored tables — drop-in for
    streamstep.stream_steps_fused, for shapes whose dense tables do not
    fit VMEM (bins = 2048)."""
    w0r, w0i = w0
    hr, hi = h
    nparts, bins = hr.shape
    nblocks = blocks.shape[0]
    if nblocks % _STEP_GROUP:
        raise ValueError(
            f"nblocks must be a multiple of {_STEP_GROUP}, got {nblocks} "
            f"(the pconv_stream wrapper handles remainders)")
    nsteps = nblocks // _STEP_GROUP
    kern = functools.partial(_split_stream_kernel, nparts, bins,
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
            pl.BlockSpec((_STEP_GROUP, pts), lambda j: (j, 0)),
            pl.BlockSpec((nparts, bins), const),               # W0 re
            pl.BlockSpec((nparts, bins), const),               # W0 im
            pl.BlockSpec((nparts, bins), const),               # h re
            pl.BlockSpec((nparts, bins), const),               # h im
            pl.BlockSpec((bins, bins), const),                 # ctab
            pl.BlockSpec((bins, bins), const),                 # ctab^T
            pl.BlockSpec((8, bins), const),                    # fwd coefs
            pl.BlockSpec((8, bins), const),                    # inv coefs
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
            pltpu.VMEM((_STEP_GROUP, bins), jnp.float32),
            pltpu.VMEM((_STEP_GROUP, bins), jnp.float32),
            pltpu.VMEM((1, bins), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks, jnp.float32), w0r, w0i, hr, hi,
      *_split_tables(bins), jnp.asarray(tail).reshape(1, bins))
    return outs, (wfr, wfi), tailf[0]


def _split_stream_tv_kernel(nparts, bins, b0_scale, pts, nsteps,
                            blk_ref, w0r_ref, w0i_ref, h0r_ref, h0i_ref,
                            ct_ref, ctt_ref, fcoef_ref, icoef_ref,
                            tail0_ref, wp2_ref,
                            out_ref, wfr_ref, wfi_ref, hfr_ref, hfi_ref,
                            tailf_ref, wr_s, wi_s, hr_s, hi_s,
                            ar_s, ai_s, tl_s):
    """TIME-VARYING whole-scan step on the factored tables (h ring
    updates in place at the decrementing slot wp2, exactly as
    streamstep._stream_tv_kernel)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        wr_s[:] = w0r_ref[:]
        wi_s[:] = w0i_ref[:]
        hr_s[:] = h0r_ref[:]
        hi_s[:] = h0i_ref[:]
        tl_s[:] = tail0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    m = bins
    # rows 2t / 2t+1 of blk are block t's input / coefficient frames;
    # one stacked matmul covers both forwards for the whole group
    fre, fim = _fwd_spectra(blk_ref[:], ctt_ref, fcoef_ref, m, hp)

    lastrow = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 0) \
        == nparts - 1
    col0 = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 1) == 0
    rowid = jax.lax.broadcasted_iota(jnp.int32, (nparts, bins), 0)
    wp2_0 = wp2_ref[0]

    for g in range(_STEP_GROUP):                   # static unroll
        fxr, fxi = fre[2 * g:2 * g + 1], fim[2 * g:2 * g + 1]
        fhr, fhi = fre[2 * g + 1:2 * g + 2], fim[2 * g + 1:2 * g + 2]

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
        ar_s[g:g + 1] = jnp.sum(prod_r, axis=0, keepdims=True)
        ai_s[g:g + 1] = jnp.sum(prod_i, axis=0, keepdims=True)

    _inverse_ola(ar_s[:], ai_s[:], ct_ref, icoef_ref, tl_s, out_ref,
                 m, pts, hp)

    @pl.when(j == nsteps - 1)
    def _flush():
        wfr_ref[:] = wr_s[:]
        wfi_ref[:] = wi_s[:]
        hfr_ref[:] = hr_s[:]
        hfi_ref[:] = hi_s[:]
        tailf_ref[:] = tl_s[:]


def stream_steps_fused_split_tv(blocks2, w0: Cplx, h0: Cplx, wp2,
                                b0_scale: float, tail, pts: int,
                                interpret: bool = False):
    """TV whole-scan launch on the factored tables — drop-in for
    streamstep.stream_steps_fused_tv."""
    w0r, w0i = w0
    h0r, h0i = h0
    nparts, bins = h0r.shape
    nblocks = blocks2.shape[0] // 2
    if blocks2.shape[0] % (2 * _STEP_GROUP):
        raise ValueError(
            f"need 2*nblocks rows with nblocks a multiple of "
            f"{_STEP_GROUP}, got {blocks2.shape[0]} rows")
    nsteps = nblocks // _STEP_GROUP
    kern = functools.partial(_split_stream_tv_kernel, nparts, bins,
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
            pl.BlockSpec((bins, bins), const),                 # ctab
            pl.BlockSpec((bins, bins), const),                 # ctab^T
            pl.BlockSpec((8, bins), const),                    # fwd coefs
            pl.BlockSpec((8, bins), const),                    # inv coefs
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
            pltpu.VMEM((_STEP_GROUP, bins), jnp.float32),
            pltpu.VMEM((_STEP_GROUP, bins), jnp.float32),
            pltpu.VMEM((1, bins), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks2, jnp.float32), w0r, w0i, h0r, h0i,
      *_split_tables(bins), jnp.asarray(tail).reshape(1, bins),
      jnp.asarray(wp2, jnp.int32).reshape(1))
    return outs, (wfr, wfi), (hfr, hfi), tailf[0]
