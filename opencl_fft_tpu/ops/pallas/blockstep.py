"""Pallas TPU kernel: fused block-step core — ring-window complex MAC +
packed bin-0 product + inverse-rFFT pre-process in ONE VMEM pass.

This is the fused replacement for the per-block chain in ``pconv_step``:
``_spectral_mac`` (dynamic_slice window + multiply + partition reduce,
replacing the reference's ``convol`` kernel, cl_conv_kernels.h:102-118)
followed by ``rfft.unpack_inverse`` (the ``c2r`` kernel,
cl_conv_kernels.h:87-100). The output feeds the half-size inverse complex
FFT directly, so XLA's remaining per-block work is one small transform +
overlap-add. Ring semantics are identical to ``ops/pallas/mac.py`` (the
doubled-ring aligned-window + static-rotate-switch pattern — see that
file for the Mosaic alignment constraints that shape it).

The unpack needs the lane-reversed accumulator (``acc[(M-i) % M]``).
Mosaic has no lane-axis reverse for this shape, so the flip is a matmul
against a one-hot permutation matrix — BIT-EXACT on the MXU: each output
lane receives exactly one nonzero product x*1, and the bf16x3 (HIGHEST)
decomposition of x reconstructs the f32 value exactly when multiplied by
an exact power-of-two (here 1.0) and summed.

VMEM budget: the MAC planes (see mac.fits_vmem) plus the (M, M) flip
matrix — gated by ``fits_vmem_blockstep``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx
from .mac import _VMEM_BUDGET


_VMEM_LIMIT = 100 * 1024 * 1024      # raised scoped-vmem cap (v5e: 128M)


def fits_vmem_blockstep(nparts: int, bins: int) -> bool:
    if nparts < 8 or nparts % 8 or bins % 128:
        return False
    # Mosaic's scoped-vmem accounting charges the rotate-switch's rolled
    # window copies once PER BRANCH (8 branches), on top of the DMA
    # scratch, the h planes + products, the flip matrix, and the full
    # step's inverse-DFT (2b x 2b) + deinterleave (2 x 2b x b) tables.
    # The pallas_call raises the scoped cap to _VMEM_LIMIT; the budget
    # here keeps a wide margin under it.
    window = 2 * (nparts + 8) * bins * 4
    # pf (b,b) + winv (2b,2b) + m1/m2 (2b,b each) + fwd DFT (b,2b)
    tables = (bins * bins + (2 * bins) ** 2 + 2 * 2 * bins * bins
              + 2 * bins * bins) * 4
    est = 9 * window + 4 * nparts * bins * 4 + tables
    return est <= 80 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _flip_matrix_np(m: int) -> np.ndarray:
    """P[j, i] = 1 iff j == (m - i) % m  =>  (x @ P)[i] = x[(m - i) % m]."""
    p = np.zeros((m, m), np.float32)
    p[(-np.arange(m)) % m, np.arange(m)] = 1.0
    return p


@functools.lru_cache(maxsize=None)
def _unpack_twiddle_np(m: int):
    """w2[i] = exp(+1j * pi * i / m) split — the iconv/c2r twiddle
    (cl_fft.cpp:192-205 sign convention), shaped (1, m)."""
    i = np.arange(m, dtype=np.float64)
    w = np.exp(1j * np.pi * i / m)
    return (w.real.astype(np.float32)[None], w.imag.astype(np.float32)[None])


def _window_mac(nparts, b0_scale, rp_ref, xr_ref, xi_ref, hr, hi,
                xr_s, xi_s, sems, fresh=None):
    """Ring-window MAC + bin-0 fix. hr/hi are VALUES (already read, and
    possibly row-substituted by the caller). ``fresh``, when given, is a
    split (1, bins) spectrum that REPLACES window row nparts-1 — the
    forward-fused step's just-computed input frame, whose ring slot still
    holds stale data at kernel time (the ring write happens outside)."""
    rp = rp_ref[0]
    # aligned-window DMA + static-rotate-switch (see mac.py)
    rp8 = pl.multiple_of((rp // 8) * 8, 8)
    cp_r = pltpu.make_async_copy(
        xr_ref.at[pl.ds(rp8, nparts + 8), :], xr_s, sems.at[0])
    cp_i = pltpu.make_async_copy(
        xi_ref.at[pl.ds(rp8, nparts + 8), :], xi_s, sems.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    col0 = jax.lax.broadcasted_iota(jnp.int32, hr.shape, 1) == 0
    lastrow = jax.lax.broadcasted_iota(jnp.int32, hr.shape, 0) == nparts - 1

    def mac_at(o):
        shift = (nparts + 8 - o) % (nparts + 8)

        def body():
            xr = pltpu.roll(xr_s[:], shift, 0)[:nparts]
            xi = pltpu.roll(xi_s[:], shift, 0)[:nparts]
            if fresh is not None:
                xr = jnp.where(lastrow, fresh[0], xr)
                xi = jnp.where(lastrow, fresh[1], xi)
            prod_r = xr * hr - xi * hi
            prod_i = xr * hi + xi * hr
            prod_r = jnp.where(col0, b0_scale * xr * hr, prod_r)
            prod_i = jnp.where(col0, b0_scale * xi * hi, prod_i)
            return (jnp.sum(prod_r, axis=0, keepdims=True),
                    jnp.sum(prod_i, axis=0, keepdims=True))
        return body

    return jax.lax.switch(rp - rp8, [mac_at(o) for o in range(8)])


def _unpack_body(re, im, wr, wi, pf):
    """Inverse-rFFT pre-process (rfft.unpack_inverse, vectorized) on
    (rows, bins) split planes; flip is a one-hot MXU matmul."""
    m = re.shape[-1]
    fr = jax.lax.dot(re, pf, precision=jax.lax.Precision.HIGHEST)
    fi = jax.lax.dot(im, pf, precision=jax.lax.Precision.HIGHEST)
    er = 0.5 * (re + fr)
    ei = 0.5 * (im - fi)
    outr_ = -0.5 * (im + fi)
    outi_ = 0.5 * (re - fr)
    pr = wr * outr_ - wi * outi_
    pi = wr * outi_ + wi * outr_
    outr = er + pr
    outi = ei + pi
    lane = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)
    c0 = lane == 0
    cm2 = lane == (m // 2)
    outr = jnp.where(c0, re + im, outr)
    outi = jnp.where(c0, re - im, outi)
    outr = jnp.where(cm2, re, outr)
    outi = jnp.where(cm2, im, outi)
    return outr, outi


def _mac_unpack_body(nparts, b0_scale, rp_ref, xr_ref, xi_ref, hr_ref,
                     hi_ref, wr_ref, wi_ref, pf_ref, xr_s, xi_s, sems):
    """Shared kernel body: ring-window MAC + bin-0 fix + inverse-rFFT
    pre-process. Returns the split (1, bins) inverse-FFT input."""
    re, im = _window_mac(nparts, b0_scale, rp_ref, xr_ref, xi_ref,
                         hr_ref[:], hi_ref[:], xr_s, xi_s, sems)
    return _unpack_body(re, im, wr_ref[:], wi_ref[:], pf_ref[:])


def _blockstep_kernel(nparts, b0_scale, rp_ref, xr_ref, xi_ref, hr_ref,
                      hi_ref, wr_ref, wi_ref, pf_ref, or_ref, oi_ref,
                      xr_s, xi_s, sems):
    outr, outi = _mac_unpack_body(nparts, b0_scale, rp_ref, xr_ref, xi_ref,
                                  hr_ref, hi_ref, wr_ref, wi_ref, pf_ref,
                                  xr_s, xi_s, sems)
    or_ref[:] = outr
    oi_ref[:] = outi


def _blockstep_full_kernel(nparts, b0_scale, pts, rp_ref, xr_ref, xi_ref,
                           hr_ref, hi_ref, wpost_ref, tail_ref, out_ref,
                           tl_ref, xr_s, xi_s, sems):
    """Full block step: MAC + unpack + inverse DFT + deinterleave + OLA in
    one VMEM pass — the whole per-block chain of ``convol`` + ``c2r`` +
    inverse ``fft`` + ``olap`` (cl_conv_kernels.h:87-124, cl_conv.cpp:
    428-455) as a single launch.

    Everything after the MAC is LINEAR in the accumulator, so the unpack
    twiddles/flip, the (2b, 2b) inverse block-DFT and the one-hot
    deinterleave selection fold into ONE f64-precomputed (2b, 2b) matrix
    (_wpost_np) — one table matmul instead of five tables (the kernel is
    bound by table HBM reads, measured r3). The OLA tail rides through
    the kernel as an input/output pair; only the ring write stays
    outside (DMA row offsets must be 8-aligned; the ring pointer is
    arbitrary)."""
    re, im = _window_mac(nparts, b0_scale, rp_ref, xr_ref, xi_ref,
                         hr_ref[:], hi_ref[:], xr_s, xi_s, sems)
    hp = jax.lax.Precision.HIGHEST
    m = pts
    z = jnp.concatenate([re, im], axis=1)                # (1, 2b)
    y = jax.lax.dot(z, wpost_ref[:], precision=hp)       # unpack+iDFT+deint
    out_ref[:] = (y[:, :m] + tail_ref[:]) / float(pts)
    tl_ref[:] = y[:, m:]


@functools.lru_cache(maxsize=None)
def _fwd_dft_np(pts: int) -> np.ndarray:
    """(pts, 2*pts) matrix F with  block @ F == [Re | Im] of the
    unnormalized forward half-size complex FFT of the zero-padded frame.

    The streaming forward chain is: frame = [block, 0] (2*pts reals) ->
    deinterleave z[n] = frame[2n] + i*frame[2n+1] -> M-point complex DFT
    (M = pts). Deinterleaving a zero-padded frame is a row SELECTION of
    the split-complex block DFT matrix (fft._leaf_matrix_np): row k of F
    is DFT-matrix row k//2 (real plane) for even k, row M + (k-1)//2
    (imag plane) for odd k — exact, no extra rounding. Replaces the
    reorder+fft stage chain of cl_conv.cpp:407-418 with one matmul."""
    from ..fft import _leaf_matrix_np

    m = pts
    w = _leaf_matrix_np(m, -1)                     # (2M, 2M) f32
    f = np.zeros((pts, 2 * m), np.float32)
    k = np.arange(pts)
    f[k % 2 == 0] = w[(k[k % 2 == 0]) // 2]
    f[k % 2 == 1] = w[m + (k[k % 2 == 1] - 1) // 2]
    return f


@functools.lru_cache(maxsize=None)
def _pack_matrix_np(m: int, forward: bool) -> np.ndarray:
    """(2m, 2m) matrix U with [re | im] @ U == the pack_forward
    (forward=True) or unpack_inverse (False) of the split spectrum.

    Both passes are LINEAR in (re, im): flip = multiplication by the
    one-hot P, twiddles are diagonals, the special bins are column
    replacements — so the whole pass folds into one f64-precomputed
    matrix (applied on the MXU with no per-element work)."""
    i = np.arange(m, dtype=np.float64)
    sign = -1.0 if forward else +1.0
    w = np.exp(sign * 1j * np.pi * i / m)
    dr, di = np.diag(w.real), np.diag(w.imag)
    eye = np.eye(m)
    p = np.zeros((m, m))
    p[(-np.arange(m)) % m, np.arange(m)] = 1.0
    if forward:
        # pack_forward: outr_ = 0.5(fi+im) [im-part], outi_ = 0.5(fr-re)
        a_rr = 0.5 * (eye + p) - 0.5 * (p - eye) @ di
        a_ir = 0.5 * (p + eye) @ dr
        a_ri = 0.5 * (p - eye) @ dr
        a_ii = 0.5 * (eye - p) + 0.5 * (p + eye) @ di
    else:
        # unpack_inverse: outr_ = -0.5(im+fi), outi_ = 0.5(re-fr)
        a_rr = 0.5 * (eye + p) - 0.5 * (eye - p) @ di
        a_ir = -0.5 * (eye + p) @ dr
        a_ri = 0.5 * (eye - p) @ dr
        a_ii = 0.5 * (eye - p) - 0.5 * (eye + p) @ di
    u = np.block([[a_rr, a_ri], [a_ir, a_ii]])
    # special output bins are column replacements
    b0 = 0.5 if forward else 1.0
    u[:, 0] = 0.0
    u[:, m] = 0.0
    u[0, 0] = b0                          # outr[0] = b0*(re0 + im0)
    u[m, 0] = b0
    u[0, m] = b0                          # outi[0] = b0*(re0 - im0)
    u[m, m] = -b0
    u[:, m // 2] = 0.0
    u[:, m + m // 2] = 0.0
    u[m // 2, m // 2] = 1.0               # untouched conjugate bin
    u[m + m // 2, m + m // 2] = 1.0
    return u


@functools.lru_cache(maxsize=None)
def _wfwd_np(pts: int) -> np.ndarray:
    """(pts, 2m) matrix: block @ W == the ENTIRE forward rFFT of the
    zero-padded frame (deinterleave + half-size DFT + pack), split
    [re | im]. f64 precompute of row-selected-DFT @ pack matrix."""
    m = pts
    jk = np.outer(np.arange(m, dtype=np.float64), np.arange(m, dtype=np.float64))
    w = np.exp(-2j * np.pi * jk / m)
    blockm = np.block([[w.real, w.imag], [-w.imag, w.real]])   # (2m, 2m) f64
    f = np.zeros((pts, 2 * m))
    k = np.arange(pts)
    f[k % 2 == 0] = blockm[(k[k % 2 == 0]) // 2]
    f[k % 2 == 1] = blockm[m + (k[k % 2 == 1] - 1) // 2]
    return (f @ _pack_matrix_np(m, True)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _wpost_np(bins: int) -> np.ndarray:
    """(2m, 2m) matrix: [accr | acci] @ W == [time[:m] | time[m:]] — the
    ENTIRE inverse half (unpack + inverse DFT + deinterleave), f64
    precompute of unpack @ inverse-DFT @ deinterleave-selection."""
    m = bins
    jk = np.outer(np.arange(m, dtype=np.float64), np.arange(m, dtype=np.float64))
    w = np.exp(+2j * np.pi * jk / m)
    winv = np.block([[w.real, w.imag], [-w.imag, w.real]])     # (2m, 2m) f64
    m1, m2 = _deinterleave_np(m)
    sel = np.concatenate([m1, m2], axis=1).astype(np.float64)  # (2m, 2m)
    return (_pack_matrix_np(m, False) @ winv @ sel).astype(np.float32)


def _blockstep_fwd_kernel(nparts, b0_scale, pts, rp_ref, blk_ref, xr_ref,
                          xi_ref, hr_ref, hi_ref, wfwd_ref, wpost_ref,
                          tail_ref, out_ref, tl_ref, fxr_ref, fxi_ref,
                          xr_s, xi_s, sems):
    """FULLY fused LTI block step: forward rFFT of the input block + MAC
    (fresh frame substituted for its stale ring row) + unpack + inverse
    DFT + deinterleave + OLA — the reference's entire per-block chain
    cl_conv.cpp:393-458 as ONE device launch with exactly TWO table
    matmuls (table HBM traffic is what bounds this kernel). Only the
    ring write stays outside (DMA row offsets must be 8-aligned; wp is
    arbitrary); the fresh spectrum is returned for it."""
    hp = jax.lax.Precision.HIGHEST
    m = pts
    zf = jax.lax.dot(blk_ref[:], wfwd_ref[:], precision=hp)   # (1, 2M)
    fxr, fxi = zf[:, :m], zf[:, m:]
    fxr_ref[:] = fxr
    fxi_ref[:] = fxi
    re, im = _window_mac(nparts, b0_scale, rp_ref, xr_ref, xi_ref,
                         hr_ref[:], hi_ref[:], xr_s, xi_s, sems,
                         fresh=(fxr, fxi))
    z = jnp.concatenate([re, im], axis=1)                # (1, 2b)
    y = jax.lax.dot(z, wpost_ref[:], precision=hp)       # unpack+iDFT+deint
    out_ref[:] = (y[:, :m] + tail_ref[:]) / float(pts)
    tl_ref[:] = y[:, m:]


def _blockstep_fwd_tv_kernel(nparts, b0_scale, pts, rp_ref, wp2_ref,
                             blk_ref, xr_ref, xi_ref, hr_ref, hi_ref,
                             wfwd_ref, wpost_ref, tail_ref,
                             out_ref, tl_ref, fxr_ref, fxi_ref, fhr_ref,
                             fhi_ref, xr_s, xi_s, sems):
    """FULLY fused TIME-VARYING block step: BOTH forward rFFTs batched in
    one (2, pts) matmul (replacing the reference's two command queues,
    cl_conv.cpp:460-522), the fresh h-frame substituted into its ring row
    (slot wp2, written outside), then MAC + the one fused post matmul as
    the LTI kernel."""
    hp = jax.lax.Precision.HIGHEST
    m = pts
    zf = jax.lax.dot(blk_ref[:], wfwd_ref[:], precision=hp)   # (2, 2M)
    fxr, fxi = zf[0:1, :m], zf[0:1, m:]
    fhr, fhi = zf[1:2, :m], zf[1:2, m:]
    fxr_ref[:] = fxr
    fxi_ref[:] = fxi
    fhr_ref[:] = fhr
    fhi_ref[:] = fhi
    hrow = jax.lax.broadcasted_iota(jnp.int32, hr_ref.shape, 0) == wp2_ref[0]
    hr = jnp.where(hrow, fhr, hr_ref[:])
    hi = jnp.where(hrow, fhi, hi_ref[:])
    re, im = _window_mac(nparts, b0_scale, rp_ref, xr_ref, xi_ref,
                         hr, hi, xr_s, xi_s, sems, fresh=(fxr, fxi))
    z = jnp.concatenate([re, im], axis=1)
    y = jax.lax.dot(z, wpost_ref[:], precision=hp)
    out_ref[:] = (y[:, :m] + tail_ref[:]) / float(pts)
    tl_ref[:] = y[:, m:]


def _fused_tables(bins: int):
    return (jnp.asarray(_wfwd_np(bins)), jnp.asarray(_wpost_np(bins)))


def block_step_fwd_fused(block, x2: Cplx, h: Cplx, rp, b0_scale: float,
                         tail, pts: int, interpret: bool = False):
    """Fully fused LTI streaming step (forward + MAC + inverse + OLA).

    block: (pts,) time samples; x2: split doubled ring (2*nparts, bins)
    in its PRE-WRITE state; h: split (nparts, bins); rp: int32 scalar =
    the post-increment ring pointer ((wp+1) % nparts); tail: (bins,).
    Returns (out_block, new_tail, fresh_re, fresh_im) — the caller writes
    (fresh_re, fresh_im) into ring slot wp (both halves of the doubled
    ring) after the call."""
    xr, xi = x2
    hr, hi = h
    nparts, bins = hr.shape
    rp = jnp.asarray(rp, jnp.int32).reshape(1)
    kern = functools.partial(_blockstep_fwd_kernel, nparts,
                             float(b0_scale), int(pts))
    spec1 = jax.ShapeDtypeStruct((1, bins), jnp.float32)
    out, new_tail, fxr, fxi = pl.pallas_call(
        kern,
        out_shape=(spec1, spec1, spec1, spec1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # block
            pl.BlockSpec(memory_space=pltpu.ANY),   # ring stays off-VMEM
            pl.BlockSpec(memory_space=pltpu.ANY),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,  # h + tables + tail
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
        scratch_shapes=[
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rp, jnp.asarray(block, jnp.float32).reshape(1, pts), xr, xi, hr, hi,
      *_fused_tables(bins), jnp.asarray(tail).reshape(1, bins))
    return out[0], new_tail[0], fxr[0], fxi[0]


def block_step_fwd_fused_tv(blocks, x2: Cplx, h: Cplx, rp, wp2,
                            b0_scale: float, tail, pts: int,
                            interpret: bool = False):
    """Fully fused TIME-VARYING streaming step.

    blocks: (2, pts) — [input block, coefficient block]; x2/h in their
    PRE-WRITE state; rp = (wp+1) % nparts; wp2 = the slot the fresh
    h-frame lands in (pre-decrement pointer). Returns (out, new_tail,
    fresh_x_re, fresh_x_im, fresh_h_re, fresh_h_im); the caller performs
    both ring writes."""
    xr, xi = x2
    hr, hi = h
    nparts, bins = hr.shape
    rp = jnp.asarray(rp, jnp.int32).reshape(1)
    wp2 = jnp.asarray(wp2, jnp.int32).reshape(1)
    kern = functools.partial(_blockstep_fwd_tv_kernel, nparts,
                             float(b0_scale), int(pts))
    spec1 = jax.ShapeDtypeStruct((1, bins), jnp.float32)
    out, new_tail, fxr, fxi, fhr, fhi = pl.pallas_call(
        kern,
        out_shape=(spec1,) * 6,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (2, pts)
            pl.BlockSpec(memory_space=pltpu.ANY),   # ring stays off-VMEM
            pl.BlockSpec(memory_space=pltpu.ANY),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,  # h + tables + tail
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 6,
        scratch_shapes=[
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rp, wp2, jnp.asarray(blocks, jnp.float32).reshape(2, pts), xr, xi,
      hr, hi, *_fused_tables(bins), jnp.asarray(tail).reshape(1, bins))
    return out[0], new_tail[0], fxr[0], fxi[0], fhr[0], fhi[0]


@functools.lru_cache(maxsize=None)
def _deinterleave_np(b: int):
    """One-hot (2b, b) matrices M1/M2 with [Yre Yim] @ M1 = time[:b] and
    @ M2 = time[b:], where time[2i] = Yre[i], time[2i+1] = Yim[i]."""
    m1 = np.zeros((2 * b, b), np.float32)
    m2 = np.zeros((2 * b, b), np.float32)
    for i in range(b // 2):
        m1[i, 2 * i] = 1.0
        m1[b + i, 2 * i + 1] = 1.0
    for i in range(b // 2, b):
        m2[i, 2 * (i - b // 2)] = 1.0
        m2[b + i, 2 * (i - b // 2) + 1] = 1.0
    return m1, m2


def block_step_fused(x2: Cplx, h: Cplx, rp, b0_scale: float, tail,
                     pts: int, interpret: bool = False):
    """Fused per-block streaming step on TPU: MAC + unpack + inverse DFT
    + deinterleave + overlap-add, one launch.

    x2: split DOUBLED input ring (2*nparts, bins); h: split (nparts,
    bins); rp: int32 scalar; tail: (bins,) OLA tail. Returns
    (out_block (bins,), new_tail (bins,)) — the complete pconv_step
    output path (ring writes stay outside)."""
    xr, xi = x2
    hr, hi = h
    nparts, bins = hr.shape
    rp = jnp.asarray(rp, jnp.int32).reshape(1)
    kern = functools.partial(_blockstep_full_kernel, nparts,
                             float(b0_scale), int(pts))
    out, new_tail = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # ring stays off-VMEM
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wpost
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tail
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rp, xr, xi, hr, hi, jnp.asarray(_wpost_np(bins)),
      jnp.asarray(tail).reshape(1, bins))
    return out[0], new_tail[0]


def block_mac_unpack(x2: Cplx, h: Cplx, rp, b0_scale: float,
                     interpret: bool = False) -> Cplx:
    """Fused: z = unpack_inverse(window_MAC(x2, h, rp)) on TPU.

    x2: split DOUBLED input ring (2*nparts, bins); h: split (nparts, bins);
    rp: int32 scalar. Returns the split (bins,) half-size inverse-FFT
    input (feed to fft_split(z, +1) + interleave).
    """
    xr, xi = x2
    hr, hi = h
    nparts, bins = hr.shape
    rp = jnp.asarray(rp, jnp.int32).reshape(1)
    wr, wi = _unpack_twiddle_np(bins)
    pf = _flip_matrix_np(bins)
    kern = functools.partial(_blockstep_kernel, nparts, float(b0_scale))
    out_r, out_i = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
            jax.ShapeDtypeStruct((1, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # ring stays off-VMEM
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # same raised scoped-vmem cap as block_step_fused: both kernels
        # share the fits_vmem_blockstep budget (est <= 80MB), which
        # assumes the raised cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(rp, xr, xi, hr, hi, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(pf))
    return out_r[0], out_i[0]
