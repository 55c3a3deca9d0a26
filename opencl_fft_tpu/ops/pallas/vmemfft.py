"""Pallas TPU kernel: whole-transform VMEM-resident FFT.

The XLA four-step path (ops/fft.py ``_fft_mm``) is HBM-pass-bound for
large transforms: each level costs ~2 full read+write passes over the
working set (concat -> matmul -> twiddle -> matmul -> transpose), landing
at ~0.6-0.8 TFLOP/s on the 2^16..2^20 sweep (measured r2). This kernel
performs a THREE-level mixed-radix decomposition of TB rows entirely in
VMEM — one HBM read and one HBM write per row.

Design rules (all measured on this backend, r2):

  * Mosaic relayouts (transposes / lane<->sublane reshapes) on lane-padded
    shapes are pathological (a digit-reversal transpose chain cost 4.7 ms
    vs ~0.5 ms for the rest of the kernel). The kernel performs ZERO
    explicit relayouts: every inter-level reordering is absorbed into the
    OPERAND ORDER of a dot_general — the MXU emits the transposed
    orientation directly, and the last level lands in natural order.
  * every intermediate keeps its minor (lane) dimension >= 128, so nothing
    is tile-padded.
  * precision is bf16x3 (Dekker hi/lo split), but the three partial
    matmuls are ONE stacked MXU contraction: [Bh Bl Bh] @ [zh; zh; zl].
    The MXU accumulates internally (no f32 epilogue adds on the VPU) and
    the 6f contraction depth triples systolic-array utilization for small
    factors. Error budget ~1.5e-5 relative per level, same as the XLA
    path's Precision.HIGH leaves.
  * TB rows per grid step amortize the fixed per-step cost (~2 us); TB is
    threaded as a leading dot_general BATCH dimension so it never forces
    a relayout.
  * Mosaic's default 16M scoped-vmem cap is raised via compiler_params
    (v5e has 128M physical VMEM).

Factorization n = f1*f2*f3 with canvas evolution (split re/im planes,
leading TB omitted):

  (f1, f2*f3)   --L1: Bstk @ z (sublane contract)-->  (k1, f2*f3)  * T1
  (k1, 6*f2, R2) --L2: dot(Bstk, z, contract mid)-->  (k2, k1, R2) * T2
  (k2*k1, 6*f3)  --L3: dot(Bstk, z, contract lane)--> (k3, k2*k1)  natural

where B = [[U, -V], [V, U]] is the split-complex block DFT matrix in
column form (U, V symmetric). The reference computes the same transform
as a bit-reversal pass plus log2(N) butterfly dispatches with a host
round-trip per stage (cl_fft.cpp:138-151).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

# n -> (f1, f2, f3). f3 = 128 keeps every lane dimension full; f1 is the
# input sublane dim. TB rows per grid step, sized so the value chain
# (~6x the TB-row canvas) stays well inside VMEM.
_PLANS = {
    1 << 13: (8, 8, 128, 16),
    1 << 14: (16, 8, 128, 16),
    1 << 15: (16, 16, 128, 8),
    1 << 16: (16, 32, 128, 8),
    1 << 17: (32, 32, 128, 4),
    1 << 18: (32, 64, 128, 2),
    1 << 19: (64, 64, 128, 1),
    1 << 20: (64, 128, 128, 1),
}

# Two-level plans n = f1 * f2 (f2 = 128 lanes) for small transforms,
# where the mm path's ~4 HBM passes dominate. TB (row block per grid
# step) is the LANE dimension of the kernel's transposed output, so it
# wants >= 128; its ceiling is the ~6x-canvas VMEM chain (tb * n * 8B
# per plane).
_PLANS2 = {
    1 << 10: (8, 128, 512),
    1 << 11: (16, 128, 256),
    1 << 12: (32, 128, 128),
    1 << 13: (64, 128, 128),
    1 << 14: (128, 128, 128),
}

_VMEM_LIMIT = 100 * 1024 * 1024


def supported(n: int) -> bool:
    return n in _PLANS or n in _PLANS2 or n in _PLANS_SL


# ---------------------------------------------------------------------------
# Host-precomputed tables (f64 trig, same recipe as the reference's host
# twiddle fill, cl_fft.cpp:86-91)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _leaf_stacked_np(f: int, sign: int, tb: int = 0) -> np.ndarray:
    """(2f, 6f) bf16 stacked block matrix [Bh | Bl | Bh] (or (tb, 2f, 6f)
    broadcast when tb > 0, for the batched-dot legacy path).

    B = [[U, -V], [V, U]] (column form) with U + iV the f-point DFT
    matrix; Bh/Bl are its Dekker bf16 hi/lo parts. Contracting against
    the stacked operand [zh; zh; zl] yields Bh@zh + Bl@zh + Bh@zl — the
    bf16x3 product — in a single MXU pass.
    """
    import ml_dtypes                       # pure-numpy bf16: this builder
    # can run inside a jit trace (lru miss), so no jnp ops here.
    jk = np.outer(np.arange(f, dtype=np.float64), np.arange(f, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * jk / f)
    u, v = w.real, w.imag
    b = np.block([[u, -v], [v, u]]).astype(np.float32)
    hi = b.astype(ml_dtypes.bfloat16)
    lo = (b - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    stk = np.concatenate([hi, lo, hi], axis=1)            # (2f, 6f)
    if not tb:
        return stk
    return np.broadcast_to(stk, (tb,) + stk.shape).copy()


@functools.lru_cache(maxsize=None)
def _leaf_gauss_stacked_np(f: int, sign: int, tb: int = 0):
    """Three (f, 3f) bf16 stacked Gauss matrices (U, V, U+V), each in
    [Mh | Ml | Mh] form so contracting against [xh; xh; xl] yields the
    real bf16x3 product. The Gauss 3-product complex multiply costs
    9 f^2 R MXU MACs per level vs the (2f, 6f) block form's 12 f^2 R —
    the in-kernel analog of the mm path's Gauss leaf (_fft_plans.GAUSS),
    motivated by the measured stack-depth dominance in
    bench_results/vmemfft_profile.json."""
    import ml_dtypes
    jk = np.outer(np.arange(f, dtype=np.float64),
                  np.arange(f, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * jk / f)
    out = []
    for m in (w.real, w.imag, w.real + w.imag):
        m32 = m.astype(np.float32)
        hi = m32.astype(ml_dtypes.bfloat16)
        lo = (m32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        stk = np.concatenate([hi, lo, hi], axis=1)          # (f, 3f)
        if tb:
            stk = np.broadcast_to(stk, (tb,) + stk.shape).copy()
        out.append(stk)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _leaf_hilo_np(f: int, sign: int, tb: int = 0):
    """(Bh, Bl) bf16 hi/lo pair of the (2f, 2f) column-form block matrix
    (tb-broadcast when tb > 0) — the un-stacked tables for the lean
    kernel's separate-dot bf16x3 form."""
    import ml_dtypes
    jk = np.outer(np.arange(f, dtype=np.float64),
                  np.arange(f, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * jk / f)
    u, v = w.real, w.imag
    b = np.block([[u, -v], [v, u]]).astype(np.float32)
    hi = b.astype(ml_dtypes.bfloat16)
    lo = (b - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    if tb:
        hi = np.broadcast_to(hi, (tb,) + hi.shape).copy()
        lo = np.broadcast_to(lo, (tb,) + lo.shape).copy()
    return hi, lo


@functools.lru_cache(maxsize=None)
def _leaf_gauss_hilo_np(f: int, sign: int, tb: int = 0):
    """Six bf16 (f, f) matrices (Uh, Ul, Vh, Vl, Sh, Sl) with S = U + V
    (tb-broadcast when tb > 0) — un-stacked Gauss tables for the lean
    kernel."""
    import ml_dtypes
    jk = np.outer(np.arange(f, dtype=np.float64),
                  np.arange(f, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * jk / f)
    out = []
    for m in (w.real, w.imag, w.real + w.imag):
        m32 = m.astype(np.float32)
        hi = m32.astype(ml_dtypes.bfloat16)
        lo = (m32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        for a in (hi, lo):
            if tb:
                a = np.broadcast_to(a, (tb,) + a.shape).copy()
            out.append(a)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _twiddle_np(f: int, rest: int, sign: int, scale: float = 1.0):
    """Level twiddle w^(k_f * j_rest), w = exp(sign*2i*pi/(f*rest));
    shape (f, rest), split f32 re/im.

    ``scale`` is folded INTO the table (host-side, exact — every level
    after the twiddle is linear): production passes the fused epilogue
    scale here so the kernels skip the trailing full-canvas multiply
    (2 VPU ops/elem on the output canvas; the kernels are VPU-bound,
    bench_results/vmemfft_profile.json)."""
    ph = np.outer(np.arange(f, dtype=np.float64), np.arange(rest, dtype=np.float64))
    w = scale * np.exp(sign * 2j * np.pi * ph / (f * rest))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _leaf_stackedT_np(f: int, sign: int):
    """Transposed stacked leaf for ROW-side dots: two (6f, f) bf16
    tables (real, imag output columns) such that
    [zh | zl | zh]_(M,6f) @ W gives the bf16x3 f-point DFT of each row
    (z stacked along lanes by _stack6). Plain (M,K)@(K,N) matmuls — the
    M dimension carries batch*f1, so Mosaic never sees a batched dot."""
    stk = _leaf_stacked_np(f, sign)          # (2f, 6f) = [Bh | Bl | Bh]
    t = stk.T.copy()                         # (6f, 2f)
    return t[:, :f].copy(), t[:, f:].copy()


@functools.lru_cache(maxsize=None)
def _twiddle_tiled_np(f1: int, f2: int, sign: int, tb: int,
                      scale: float = 1.0):
    """(tb*f1, f2) f32 re/im twiddle scale·ω_N^{k1·b} with rows tiled
    over tb (row r carries digit k1 = r mod f1) — 2-D so the kernel
    never touches a 3-D broadcast. The epilogue scale folds here
    (exact f32, applied before the last linear level)."""
    tr, ti = _twiddle_np(f1, f2, sign, scale)
    return (np.tile(tr, (tb, 1)).copy(), np.tile(ti, (tb, 1)).copy())


@functools.lru_cache(maxsize=None)
def _wcol_np(f1: int, sign: int, tb: int):
    """(tb*f1, f1) f32 re/im sublane-DFT weight columns: column s at row
    r (output digit k = r mod f1) holds ω_{f1}^{k·((k+s) mod f1)} — the
    weight of the rolled-by-s canvas in out[k] (_vmemfft_sl_kernel)."""
    k = np.arange(f1, dtype=np.float64)[:, None]
    s = np.arange(f1, dtype=np.float64)[None, :]
    n1 = np.mod(k + s, f1)
    w = np.exp(sign * 2j * np.pi * k * n1 / f1)
    wr = np.tile(w.real.astype(np.float32), (tb, 1)).copy()
    wi = np.tile(w.imag.astype(np.float32), (tb, 1)).copy()
    return wr, wi


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _stack6(re, im, axis):
    """[re_h; im_h; re_h; im_h; re_l; im_l] along `axis` (bf16)."""
    reh = re.astype(jnp.bfloat16)
    rel = (re - reh.astype(jnp.float32)).astype(jnp.bfloat16)
    imh = im.astype(jnp.bfloat16)
    iml = (im - imh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([reh, imh, reh, imh, rel, iml], axis=axis)


def _stack3(x, axis):
    """[x_h; x_h; x_l] along `axis` (bf16) — one real bf16x3 operand."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([xh, xh, xl], axis=axis)


def _vmemfft_kernel(f1, f2, f3, tb, scale, in_r, in_i, w1, w2, w3, t1r, t1i,
                    t2r, t2i, out_r, out_i):
    # L1 — contract f1 over sublanes: (tb,2f1,6f1) x (tb,6f1,R1)
    z = _stack6(in_r[:], in_i[:], axis=1)               # (tb, 6f1, R1)
    y = jax.lax.dot_general(w1[:], z, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f1, :], y[:, f1:, :]                 # (tb, k1, R1)
    tr, ti = t1r[:], t1i[:]
    re, im = re * tr - im * ti, re * ti + im * tr

    # L2 — contract f2 (middle); MXU emits (tb, k2, k1, R2) directly
    re = re.reshape(tb, f1, f2, f3)
    im = im.reshape(tb, f1, f2, f3)
    z = _stack6(re, im, axis=2)                         # (tb, k1, 6f2, R2)
    y = jax.lax.dot_general(w2[:], z, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f2], y[:, f2:]                       # (tb, k2, k1, R2)
    tr, ti = t2r[:], t2i[:]
    tr = tr[None, :, None, :]
    ti = ti[None, :, None, :]
    pr = re * tr - im * ti
    pi = re * ti + im * tr

    # L3 — contract f3 (lanes); MXU emits (tb, k3, k2*k1) == natural order
    re = pr.reshape(tb, f2 * f1, f3)
    im = pi.reshape(tb, f2 * f1, f3)
    z = _stack6(re, im, axis=2)                         # (tb, k2k1, 6f3)
    y = jax.lax.dot_general(w3[:], z, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        # epilogue scale on VMEM-resident data: a normalization applied
        # OUTSIDE the pallas_call costs a full extra HBM read+write pass
        # (XLA cannot fuse into a kernel output); here it is free
        y = y * scale
    out_r[:] = y[:, :f3, :]
    out_i[:] = y[:, f3:, :]


def _vmemfft_t_kernel(f1, f2, f3, tb, scale, in_r, in_i, w1, w2, w3, t1r, t1i,
                      t2r, t2i, out_r, out_i):
    """Three-level variant with an explicit in-VMEM digit transpose.

    The production kernel's L2 contracts the MIDDLE canvas dim with two
    RHS free dims (k1, R2) that are non-adjacent in memory, which Mosaic
    lowers as a k1-loop of (2f2,6f2)x(6f2,f3) matmuls. Here L1's output
    is digit-transposed (tb,f1,f2,f3)->(tb,f2,f1,f3) once in VMEM so L2
    becomes ONE wide dot per row block with N = f1*f3 lanes — trading a
    relayout for matmul shape. Output ordering is identical to the
    production kernel (L2 emits the same (k2,k1,f3) canvas)."""
    z = _stack6(in_r[:], in_i[:], axis=1)               # (tb, 6f1, R1)
    y = jax.lax.dot_general(w1[:], z, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f1, :], y[:, f1:, :]                 # (tb, k1, R1)
    tr, ti = t1r[:], t1i[:]
    re, im = re * tr - im * ti, re * ti + im * tr

    # digit transpose: (tb, k1, f2, f3) -> (tb, f2, k1, f3); minor dim
    # (f3 = 128 lanes) untouched, so this is a tile-row permutation
    re = jnp.transpose(re.reshape(tb, f1, f2, f3), (0, 2, 1, 3))
    im = jnp.transpose(im.reshape(tb, f1, f2, f3), (0, 2, 1, 3))
    z = _stack6(re.reshape(tb, f2, f1 * f3),
                im.reshape(tb, f2, f1 * f3), axis=1)    # (tb, 6f2, k1*f3)
    y = jax.lax.dot_general(w2[:], z, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f2], y[:, f2:]                       # (tb, k2, k1*f3)
    re = re.reshape(tb, f2, f1, f3)
    im = im.reshape(tb, f2, f1, f3)
    tr, ti = t2r[:], t2i[:]
    tr = tr[None, :, None, :]
    ti = ti[None, :, None, :]
    pr = re * tr - im * ti
    pi = re * ti + im * tr

    # L3 — identical to the production kernel (same (k2,k1,f3) canvas)
    re = pr.reshape(tb, f2 * f1, f3)
    im = pi.reshape(tb, f2 * f1, f3)
    z = _stack6(re, im, axis=2)                         # (tb, k2k1, 6f3)
    y = jax.lax.dot_general(w3[:], z, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        y = y * scale
    out_r[:] = y[:, :f3, :]
    out_i[:] = y[:, f3:, :]


def _vmemfft_tmix_kernel(f1, f2, f3, tb, scale, mask, *refs):
    """Transposed-L2 three-level kernel with per-level Gauss leaves.

    Same dataflow as _vmemfft_t_kernel, but levels selected by ``mask``
    (bit l = level l+1) replace the split-complex block matmul
    ((2f, 6f) stacked form, 12 f^2 R MACs) with the Gauss complex
    product — t1 = U@re, t2 = V@im, t3 = (U+V)@(re+im);
    out = (t1 - t2, t3 - t1 - t2) — three (f, 3f)-stacked real bf16x3
    dots, 9 f^2 R MACs. The profiler attributed the kernel's compute to
    MXU stack depth (bench_results/vmemfft_profile.json), so the 25%
    MAC cut attacks the dominant term — but a Gauss dot has f output
    rows where the block form has 2f, so it only pays on levels whose
    factor fills the 128-row MXU (measured 2^16: Gauss-everywhere LOSES
    at plan (16,32,128), wins at (32,16,128) — vmemfft_ab.json). Slight
    cancellation error growth (t3 - t1 - t2), same tradeoff the mm
    path's Gauss leaf accepted.

    refs layout: in_r, in_i, per-level tables (3 gauss [U,V,S] if the
    mask bit is set, else 1 stacked block), t1r, t1i, t2r, t2i,
    out_r, out_i.
    """
    it = iter(refs)
    in_r, in_i = next(it), next(it)
    tabs = [tuple(next(it) for _ in range(3 if mask >> lv & 1 else 1))
            for lv in range(3)]
    t1r, t1i, t2r, t2i = next(it), next(it), next(it), next(it)
    out_r, out_i = next(it), next(it)

    def level(lv, f, re, im, axis, dims):
        t = tabs[lv]
        if len(t) == 3:
            p1 = jax.lax.dot_general(t[0][:], _stack3(re, axis), dims,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(t[1][:], _stack3(im, axis), dims,
                                     preferred_element_type=jnp.float32)
            p3 = jax.lax.dot_general(t[2][:], _stack3(re + im, axis), dims,
                                     preferred_element_type=jnp.float32)
            return p1 - p2, p3 - p1 - p2
        y = jax.lax.dot_general(t[0][:], _stack6(re, im, axis), dims,
                                preferred_element_type=jnp.float32)
        return y[:, :f], y[:, f:]

    dims_mid = (((2,), (1,)), ((0,), (0,)))    # contract middle canvas dim
    dims_lane = (((2,), (2,)), ((0,), (0,)))   # contract lane (minor) dim

    # L1 — contract f1 over sublanes
    re, im = level(0, f1, in_r[:], in_i[:], 1, dims_mid)
    tr, ti = t1r[:], t1i[:]
    re, im = re * tr - im * ti, re * ti + im * tr       # (tb, k1, R1)

    # digit transpose (tb,k1,f2,f3)->(tb,f2,k1,f3); minor dim untouched
    re = jnp.transpose(re.reshape(tb, f1, f2, f3), (0, 2, 1, 3))
    im = jnp.transpose(im.reshape(tb, f1, f2, f3), (0, 2, 1, 3))
    re, im = level(1, f2, re.reshape(tb, f2, f1 * f3),
                   im.reshape(tb, f2, f1 * f3), 1, dims_mid)
    re = re.reshape(tb, f2, f1, f3)                     # (tb, k2, k1, f3)
    im = im.reshape(tb, f2, f1, f3)
    tr = t2r[:][None, :, None, :]
    ti = t2i[:][None, :, None, :]
    pr = re * tr - im * ti
    pi = re * ti + im * tr

    # L3 — contract f3 (lanes); emits (tb, k3, k2*k1) == natural order
    re, im = level(2, f3, pr.reshape(tb, f2 * f1, f3),
                   pi.reshape(tb, f2 * f1, f3), 2, dims_lane)
    if scale != 1.0:
        re = re * scale                     # free epilogue (see 3-level)
        im = im * scale
    out_r[:] = re
    out_i[:] = im


def _vmemfft_lean_kernel(f1, f2, f3, tb, scale, mask, *refs):
    """Transposed-L2 three-level kernel with NO stacked-operand concats.

    Same dataflow as _vmemfft_tmix_kernel, but the bf16x3 product is
    issued as SEPARATE dots on raw hi/lo planes instead of one stacked
    contraction: the _stack6/_stack3 concats copy 6 (or 3x3) bf16 planes
    per level through VMEM, and the kernels are VPU/copy-bound
    (bench_results/vmemfft_profile.json stack_depth attribution), so
    trading the copies for extra dot issues + f32 accumulate adds is a
    measured question — this variant exists to race it (levels=7).

    Block levels (mask bit clear): z = [re; im] hi/lo pairs, ONE 2-plane
    concat each, then y = Bh@zh + Bl@zh + Bh@zl (3 dots, 2 adds).
    Gauss levels (mask bit set): no concats at all — each of the three
    real products M@x is Mh@xh + Mh@xl + Ml@xh on raw planes.

    refs layout: in_r, in_i, per-level tables (3 gauss [U,V,S] hi/lo
    pairs -> 6 refs if the mask bit is set, else [Bh, Bl] -> 2 refs),
    t1r, t1i, t2r, t2i, out_r, out_i.
    """
    it = iter(refs)
    in_r, in_i = next(it), next(it)
    tabs = [tuple(next(it) for _ in range(6 if mask >> lv & 1 else 2))
            for lv in range(3)]
    t1r, t1i, t2r, t2i = next(it), next(it), next(it), next(it)
    out_r, out_i = next(it), next(it)

    def hilo(x):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        return xh, xl

    def x3dot(mh, ml, xh, xl, dims):
        y = jax.lax.dot_general(mh[:], xh, dims,
                                preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(ml[:], xh, dims,
                                 preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(mh[:], xl, dims,
                                 preferred_element_type=jnp.float32)
        return y

    def level(lv, f, re, im, axis, dims):
        t = tabs[lv]
        if len(t) == 6:
            uh, ul, vh, vl, sh, sl = t
            reh, rel = hilo(re)
            imh, iml = hilo(im)
            s_h, s_l = hilo(re + im)
            p1 = x3dot(uh, ul, reh, rel, dims)     # U @ re
            p2 = x3dot(vh, vl, imh, iml, dims)     # V @ im
            p3 = x3dot(sh, sl, s_h, s_l, dims)     # (U+V) @ (re+im)
            # out = (U@re - V@im, (U+V)@(re+im) - U@re - V@im)
            return p1 - p2, p3 - p1 - p2
        bh, bl = t
        reh, rel = hilo(re)
        imh, iml = hilo(im)
        zh = jnp.concatenate([reh, imh], axis=axis)
        zl = jnp.concatenate([rel, iml], axis=axis)
        y = jax.lax.dot_general(bh[:], zh, dims,
                                preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(bl[:], zh, dims,
                                 preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(bh[:], zl, dims,
                                 preferred_element_type=jnp.float32)
        return y[:, :f], y[:, f:]

    dims_mid = (((2,), (1,)), ((0,), (0,)))    # contract middle canvas dim
    dims_lane = (((2,), (2,)), ((0,), (0,)))   # contract lane (minor) dim

    re, im = level(0, f1, in_r[:], in_i[:], 1, dims_mid)
    tr, ti = t1r[:], t1i[:]
    re, im = re * tr - im * ti, re * ti + im * tr       # (tb, k1, R1)

    re = jnp.transpose(re.reshape(tb, f1, f2, f3), (0, 2, 1, 3))
    im = jnp.transpose(im.reshape(tb, f1, f2, f3), (0, 2, 1, 3))
    re, im = level(1, f2, re.reshape(tb, f2, f1 * f3),
                   im.reshape(tb, f2, f1 * f3), 1, dims_mid)
    re = re.reshape(tb, f2, f1, f3)                     # (tb, k2, k1, f3)
    im = im.reshape(tb, f2, f1, f3)
    tr = t2r[:][None, :, None, :]
    ti = t2i[:][None, :, None, :]
    pr = re * tr - im * ti
    pi = re * ti + im * tr

    re, im = level(2, f3, pr.reshape(tb, f2 * f1, f3),
                   pi.reshape(tb, f2 * f1, f3), 2, dims_lane)
    if scale != 1.0:
        re = re * scale
        im = im * scale
    out_r[:] = re
    out_i[:] = im


def _vmemfft2_kernel(f1, f2, tb, scale, in_r, in_i, w1, w2, t1r, t1i,
                     out_r, out_i):
    """Two-level variant with NO batched dots.

    Batch-dim dot_generals lower in Mosaic as per-row loops of tiny
    matmuls (measured r3: 3.5 ms vs mm's 0.25 ms at 2^10) — so here the
    shared leaf is the LHS of a plain contraction and the row block tb
    rides along as an rhs free dimension. Each level is ONE big MXU
    matmul. The price: the output lands freq-major, i.e. TRANSPOSED
    ((f2, f1, tb) = X^T) — the wrapper restores row-major with one XLA
    transpose pass, still a net win for sizes where the mm path is
    multi-pass-bound."""
    # L1 — contract f1: (2f1, 6f1) x (tb, 6f1, f2) -> (2f1, tb, f2)
    z = _stack6(in_r[:], in_i[:], axis=1)               # (tb, 6f1, f2)
    y = jax.lax.dot_general(w1[:], z, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    re, im = y[:f1], y[f1:]                             # (k1, tb, f2)
    tr, ti = t1r[:], t1i[:]                             # (f1, 1, f2)
    re, im = re * tr - im * ti, re * ti + im * tr

    # L2 — contract f2 (lanes): (2f2, 6f2) x (f1, tb, 6f2) -> (2f2, f1, tb)
    z = _stack6(re, im, axis=2)                         # (k1, tb, 6f2)
    y = jax.lax.dot_general(w2[:], z, (((1,), (2,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        y = y * scale                       # free epilogue (see 3-level)
    if out_r.shape[0] == tb:                # row-major out: in-kernel
        y = jnp.transpose(y, (2, 0, 1))     # relayout of one (2f2,f1,tb)
        out_r[:] = y[:, :f2]                # block per step
        out_i[:] = y[:, f2:]
    else:
        out_r[:] = y[:f2]
        out_i[:] = y[f2:]


def _vmemfft_sl_kernel(f1, f2, tb, inkernel_t, in_r, in_i, w2tr, w2ti,
                       t1r, t1i, wcr, wci, out_r, out_i):
    """Two-level kernel: SUBLANE-digit DFT on the VPU + lane-leaf MXU dot.

    The r3/r4 two-level kernels lost at 2^10-2^12 (3565 us vs mm's 255,
    bench_results/vmemfft_ab.json) because every formulation of the
    f1 level either batched the leaf dot (Mosaic lowers that as a
    per-row loop of tiny matmuls) or forced an in-kernel canvas
    relayout between the levels. This kernel removes both:

      * the f1-point DFT over the SUBLANE digit a (stride f2, which
        must pair with the LOW output digit k1) runs on the VPU as f1
        static `pltpu.roll`s of the raw canvas with host-precomputed
        per-output-digit weight columns: A[.., k1, ..] = sum_s
        w[k1, s] * x[.., (k1+s) mod f1, ..]. The group-cyclic index is
        two global rolls (cumulative 1-step + f1) blended by a
        sublane-digit mask — exact f32 MACs, no unaligned slices.
      * the f2-point leaf over the LANE digit is ONE plain
        (tb*f1, 6f2) x (6f2, f2) bf16x3 matmul per output plane — the
        shared table is a plain dot operand with batch*f1 folded into M
        (the shape VERDICT r4 #2 prescribed), so the MXU sees full
        128-row tiles at any tb >= 16.

    The factored FFT's one digit transpose (out index k = k1 + f1*k2;
    the canvas computes (k1, k2)-major) is NOT avoidable; it is taken
    either in-kernel (`inkernel_t`: one (tb, f1, f2) -> (tb, f2, f1)
    value relayout before the store — racing the r2 "relayouts are
    pathological" rule at small-plane shapes) or as one XLA transpose
    pass in the wrapper (2 HBM passes total, still below the mm path's
    measured cost at 2^11-2^13). Reference equivalent: log2(n) kernel
    dispatches + bit-reversal pass (cl_fft.cpp:138-151).
    """
    M = tb * f1
    xr = in_r[:].reshape(M, f2)
    xi = in_i[:].reshape(M, f2)

    # L1: sublane-digit DFT (a -> k1), exact f32
    kdig = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) & (f1 - 1)
    wr, wi = wcr[:], wci[:]                              # (M, f1)
    acc_r = wr[:, 0:1] * xr - wi[:, 0:1] * xi
    acc_i = wr[:, 0:1] * xi + wi[:, 0:1] * xr
    ar, ai = xr, xi
    for s in range(1, f1):
        # cumulative: after s steps ar[r] == xr[(r + s) mod M]
        ar = pltpu.roll(ar, M - 1, 0)
        ai = pltpu.roll(ai, M - 1, 0)
        br = pltpu.roll(ar, f1, 0)                       # x[(r + s - f1)]
        bi = pltpu.roll(ai, f1, 0)
        m = kdig < (f1 - s)
        ur = jnp.where(m, ar, br)
        ui = jnp.where(m, ai, bi)
        cr, ci = wr[:, s:s + 1], wi[:, s:s + 1]
        acc_r = acc_r + cr * ur - ci * ui
        acc_i = acc_i + cr * ui + ci * ur

    # twiddle T[k1, b] (scale folded here: f32, before the last level)
    tr, ti = t1r[:], t1i[:]                              # (M, f2) tiled
    hr = acc_r * tr - acc_i * ti
    hi = acc_r * ti + acc_i * tr

    # L2: lane-leaf dot (b -> k2), bf16x3 stacked
    z = _stack6(hr, hi, axis=1)                          # (M, 6f2) bf16
    yr = jax.lax.dot_general(z, w2tr[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    yi = jax.lax.dot_general(z, w2ti[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if inkernel_t:
        out_r[:] = jnp.transpose(yr.reshape(tb, f1, f2), (0, 2, 1))
        out_i[:] = jnp.transpose(yi.reshape(tb, f1, f2), (0, 2, 1))
    else:
        out_r[:] = yr.reshape(tb, f1, f2)
        out_i[:] = yi.reshape(tb, f1, f2)


def _vmemfft3h_kernel(f1, f2, f3, tb, scale, in_r, in_i, w1, w2, w3, t1r, t1i,
                      t2r, t2i, out_r, out_i):
    """Hybrid three-level kernel: L1 keeps the tb-batched dot (few
    iterations, each with a large streaming dimension), then (tb, f1)
    merge (outer-into-sublane, free for f1 % 8 == 0) makes L2 and L3
    single no-batch matmuls — avoiding Mosaic's per-row lowering of
    batched dots (measured r3), at the price of a freq-major output
    ((f3, f2, rows*f1) with (row, k1) interleaved lanes) that the
    wrapper restores with one XLA transpose pass."""
    z = _stack6(in_r[:], in_i[:], axis=1)               # (tb, 6f1, R1)
    y = jax.lax.dot_general(w1[:], z, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    re, im = y[:, :f1], y[:, f1:]                       # (tb, k1, R1)
    tr, ti = t1r[:], t1i[:]                             # (1, f1, R1)
    re, im = re * tr - im * ti, re * ti + im * tr

    re = re.reshape(tb * f1, f2, f3)                    # outer/sublane merge
    im = im.reshape(tb * f1, f2, f3)
    z = _stack6(re, im, axis=1)                         # (tbf1, 6f2, f3)
    y = jax.lax.dot_general(w2[:], z, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    re, im = y[:f2], y[f2:]                             # (k2, tbf1, f3)
    tr, ti = t2r[:], t2i[:]                             # (f2, 1, f3)
    re, im = re * tr - im * ti, re * ti + im * tr

    z = _stack6(re, im, axis=2)                         # (k2, tbf1, 6f3)
    y = jax.lax.dot_general(w3[:], z, (((1,), (2,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        y = y * scale                       # free epilogue (see 3-level)
    out_r[:] = y[:f3]                                   # (k3, k2, tbf1)
    out_i[:] = y[f3:]


def _vmemfft_front2_kernel(f1, f2, fc, mask, *refs):
    """Front-two-levels kernel: L1 + T1 + digit transpose + L2 + T2 only.

    The whole-transform kernels above lose at 2^19/2^20 because the grid
    is rows-only (batch 4-8 at the ~32MB bench point) — too few steps to
    pipeline the DMA against compute, so the HBM trip serializes with the
    3-level body (measured 413-423 us vs mm 357 at 2^20,
    bench_results/vmemfft_ab.json). This kernel fuses only the first TWO
    levels and grids over (rows x f3-chunks): f3 is untouched by L1/L2
    (both twiddle tables slice cleanly along it), so chunking it by
    fc = 128 lanes multiplies the grid by f3/fc and restores pipelining.
    The remaining f3-point leaf runs OUTSIDE as one XLA dot_general whose
    operand order emits the final (k3, k2*k1) natural-order transpose for
    free (ops/fft._leaf_dft_out_t) — 2 HBM round trips total vs the mm
    path's 3 and the whole-transform kernel's 1 + unpipelined body.

    Each grid cell holds one (f1, f2, fc) sub-canvas; both dots are PLAIN
    contractions with the shared leaf stack on the LHS (no batch dims —
    Mosaic lowers batched dots as per-row loops, CLAUDE.md). ``mask``
    selects the Gauss 3-product form per level (bit l = level l+1), same
    tradeoff as _vmemfft_tmix_kernel.

    refs: in_r, in_i, per-level tables (3 gauss [U,V,S] or 1 block
    stack), t1r, t1i, t2r, t2i, out_r, out_i.

    Measured r3 (bench_results/vmemfft_ab.json): LOSES everywhere —
    2^18: 417-438 us across plans vs the whole-transform Gauss kernel's
    317.8 (4/4 rounds); 2^20: 457.5/530.2 us vs mm 360.4 (5/5). The
    restored pipelining does not pay for the second HBM round trip plus
    the per-grid-step overhead of small-factor dots (f <= 64 underfills
    the 128-row MXU even in block form). Kept as an opt-in documented
    negative (levels=8): with the 2-level XLA tree compute-infeasible at
    the 1.5e-5 budget and this 2-pass hybrid measured out, the mm path's
    ~3-HBM-pass structure at 2^20 (94% of its pass floor) and the fused
    kernel at 2^18 are the honest plateau.
    """
    it = iter(refs)
    in_r, in_i = next(it), next(it)
    tabs = [tuple(next(it) for _ in range(3 if mask >> lv & 1 else 1))
            for lv in range(2)]
    t1r, t1i, t2r, t2i = next(it), next(it), next(it), next(it)
    out_r, out_i = next(it), next(it)
    dims = (((1,), (0,)), ((), ()))

    def level(lv, f, re, im):
        t = tabs[lv]
        if len(t) == 3:
            p1 = jax.lax.dot_general(t[0][:], _stack3(re, 0), dims,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(t[1][:], _stack3(im, 0), dims,
                                     preferred_element_type=jnp.float32)
            p3 = jax.lax.dot_general(t[2][:], _stack3(re + im, 0), dims,
                                     preferred_element_type=jnp.float32)
            return p1 - p2, p3 - p1 - p2
        y = jax.lax.dot_general(t[0][:], _stack6(re, im, 0), dims,
                                preferred_element_type=jnp.float32)
        return y[:f], y[f:]

    # L1 — contract f1: (2f1, 6f1) x (6f1, f2*fc)
    re = in_r[:].reshape(f1, f2 * fc)
    im = in_i[:].reshape(f1, f2 * fc)
    re, im = level(0, f1, re, im)                       # (k1, f2*fc)
    tr = t1r[:].reshape(f1, f2 * fc)
    ti = t1i[:].reshape(f1, f2 * fc)
    re, im = re * tr - im * ti, re * ti + im * tr

    # digit transpose (k1, f2, fc) -> (f2, k1, fc); minor dim untouched
    re = jnp.transpose(re.reshape(f1, f2, fc), (1, 0, 2)).reshape(f2, f1 * fc)
    im = jnp.transpose(im.reshape(f1, f2, fc), (1, 0, 2)).reshape(f2, f1 * fc)
    re, im = level(1, f2, re, im)                       # (k2, k1*fc)
    re = re.reshape(f2, f1, fc)
    im = im.reshape(f2, f1, fc)
    tr = t2r[:][:, None, :]                             # (f2, 1, fc)
    ti = t2i[:][:, None, :]
    pr = re * tr - im * ti
    pi = re * ti + im * tr
    out_r[:] = pr.reshape(1, f2, f1, fc)
    out_i[:] = pi.reshape(1, f2, f1, fc)


# Front-2 hybrid plans: n -> (f1, f2, f3) with f3 >= 256 chunked by
# fc = 128 lanes (grid = rows x f3/128) and the f3 leaf as one XLA dot.
# Factor placement minimizes MXU row/depth underfill of the stacked
# block dots: C(f) = ceil(2f/128)*ceil(6f/128)/f is lowest at f = 64.
_PLANS_F2 = {
    1 << 18: (32, 32, 256),
    1 << 19: (64, 32, 256),
    1 << 20: (64, 64, 256),
}

# Measured Gauss level mask per size for the front-2 kernel (bit l =
# level l+1); default 0 (block form) — f <= 64 leaves half-fill the
# Gauss rows.
_MASKS_F2: dict = {}


@functools.lru_cache(maxsize=None)
def _build_front2(n: int, sign: int, rows: int, interpret: bool,
                  plan_override=None, scale: float = 1.0, mask: int = 0):
    f1, f2, f3 = (plan_override or _PLANS_F2[n])[:3]
    if f1 * f2 * f3 != n:
        raise ValueError(f"front2 plan {(f1, f2, f3)} != n={n}")
    fc = min(128, f3)
    t1r, t1i = _twiddle_np(f1, f2 * f3, sign)
    # the fused normalization rides the T2 table (host fold, exact: the
    # outside f3 leaf is linear)
    t2r, t2i = _twiddle_np(f2, f3, sign, scale)
    tables = []
    for lv, f in enumerate((f1, f2)):
        if mask >> lv & 1:
            tables += list(_leaf_gauss_stacked_np(f, sign))
        else:
            tables.append(_leaf_stacked_np(f, sign))
    tables += [t1r.reshape(f1, f2, f3), t1i.reshape(f1, f2, f3), t2r, t2i]
    kern = functools.partial(_vmemfft_front2_kernel, f1, f2, fc, mask)
    tab_specs = []
    for t in tables[:-4]:
        tab_specs.append(pl.BlockSpec(
            t.shape, (lambda nd: lambda r, c: (0,) * nd)(t.ndim),
            memory_space=pltpu.VMEM))
    tab_specs += [
        pl.BlockSpec((f1, f2, fc), lambda r, c: (0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f1, f2, fc), lambda r, c: (0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f2, fc), lambda r, c: (0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f2, fc), lambda r, c: (0, c),
                     memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kern,
        grid=(rows, f3 // fc),
        out_shape=(
            jax.ShapeDtypeStruct((rows, f2, f1, f3), jnp.float32),
            jax.ShapeDtypeStruct((rows, f2, f1, f3), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, f1, f2, fc), lambda r, c: (r, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f1, f2, fc), lambda r, c: (r, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ] + tab_specs,
        out_specs=(
            pl.BlockSpec((1, f2, f1, fc), lambda r, c: (r, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2, f1, fc), lambda r, c: (r, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return call, tables, (f1, f2, f3)


def fft_vmem_front2(x: Cplx, sign: int, interpret: bool = False,
                    scale: float = 1.0,
                    plan_override: Tuple[int, ...] | None = None,
                    gauss_mask: int = 0, gauss_l3: bool = True) -> Cplx:
    """Unnormalized DFT via the front-2 kernel + one XLA f3-leaf pass.

    Matches fft_split(x, sign, "mm") within the bf16x3 budget. The f3
    leaf honors gauss_l3 (Gauss 3-matmul form, on by default — f3 >= 256
    fills the MXU rows) and lands in natural order via the transposed-
    output einsum (no separate transpose pass).
    """
    from .. import fft as _fft     # lazy: fft.py imports this module lazily
    re, im = x
    n = re.shape[-1]
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    plan = tuple(plan_override[:3]) if plan_override else None
    call, tables, (f1, f2, f3) = _build_front2(
        n, sign, rows, interpret, plan, scale, gauss_mask)
    re4 = re.reshape(rows, f1, f2, f3)
    im4 = im.reshape(rows, f1, f2, f3)
    yr, yi = call(re4, im4, *[jnp.asarray(t) for t in tables])
    yr = yr.reshape(rows, f2 * f1, f3)
    yi = yi.reshape(rows, f2 * f1, f3)
    yr, yi = _fft._leaf_dft_out_t(yr, yi, sign,
                                  gauss_min=1 if gauss_l3 else 1 << 30)
    return yr.reshape(lead + (n,)), yi.reshape(lead + (n,))


# Hybrid-kernel plans: n -> (f1, f2, f3, tb) with f3 = 128 lanes and
# f1 * tb >= 128 (the merged (row, k1) lane dimension of the output).
_PLANS3H = {
    1 << 15: (32, 8, 128, 8),
    1 << 16: (32, 16, 128, 8),
    1 << 17: (64, 16, 128, 4),
    1 << 18: (64, 32, 128, 2),
    1 << 19: (128, 32, 128, 1),
    1 << 20: (128, 64, 128, 1),
}


@functools.lru_cache(maxsize=None)
def _build3h(n: int, sign: int, rows: int, interpret: bool, tb_override=None,
             scale: float = 1.0):
    f1, f2, f3, tb = _PLANS3H[n]
    if tb_override:
        tb = tb_override
    while rows % tb:
        tb //= 2
    t1r, t1i = _twiddle_np(f1, f2 * f3, sign)
    # the fused normalization rides the L2 twiddle table (host fold,
    # exact); the kernel's trailing scale multiply is dead
    t2r, t2i = _twiddle_np(f2, f3, sign, scale)
    tables = [
        _leaf_stacked_np(f1, sign, tb),
        _leaf_stacked_np(f2, sign),
        _leaf_stacked_np(f3, sign),
        t1r.reshape(1, f1, f2 * f3), t1i.reshape(1, f1, f2 * f3),
        t2r.reshape(f2, 1, f3), t2i.reshape(f2, 1, f3),
    ]
    kern = functools.partial(_vmemfft3h_kernel, f1, f2, f3, tb, 1.0)
    table_specs = [pl.BlockSpec(t.shape, (lambda nd: lambda b: (0,) * nd)(t.ndim),
                                memory_space=pltpu.VMEM) for t in tables]
    call = pl.pallas_call(
        kern,
        grid=(rows // tb,),
        out_shape=(                # (k3, k2, (row, k1)) freq-major layout
            jax.ShapeDtypeStruct((f3, f2, rows * f1), jnp.float32),
            jax.ShapeDtypeStruct((f3, f2, rows * f1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((tb, f1, f2 * f3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f1, f2 * f3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + table_specs,
        out_specs=(
            pl.BlockSpec((f3, f2, tb * f1), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f3, f2, tb * f1), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return call, tables, (f1, f2, f3)


# ---------------------------------------------------------------------------
# Host-side entry
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build2(n: int, sign: int, rows: int, interpret: bool, tb_override=None,
            rowmajor_out: bool = False, scale: float = 1.0):
    f1, f2, tb = _PLANS2[n]
    if tb_override:
        tb = tb_override
    while rows % tb:
        tb //= 2
    # fused normalization folded into the (only) twiddle table — see
    # _twiddle_np; L2 is linear, so this is exact
    t1r, t1i = _twiddle_np(f1, f2, sign, scale)
    tables = [
        _leaf_stacked_np(f1, sign),
        _leaf_stacked_np(f2, sign),
        t1r.reshape(f1, 1, f2),
        t1i.reshape(f1, 1, f2),
    ]
    kern = functools.partial(_vmemfft2_kernel, f1, f2, tb, 1.0)
    table_specs = [pl.BlockSpec(t.shape, (lambda nd: lambda b: (0,) * nd)(t.ndim),
                                memory_space=pltpu.VMEM) for t in tables]
    if rowmajor_out:
        out_shape = tuple(jax.ShapeDtypeStruct((rows, f2, f1), jnp.float32)
                          for _ in range(2))
        out_specs = tuple(pl.BlockSpec((tb, f2, f1), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
                          for _ in range(2))
    else:
        out_shape = tuple(jax.ShapeDtypeStruct((f2, f1, rows), jnp.float32)
                          for _ in range(2))
        out_specs = tuple(pl.BlockSpec((f2, f1, tb), lambda b: (0, 0, b),
                                       memory_space=pltpu.VMEM)
                          for _ in range(2))
    call = pl.pallas_call(
        kern,
        grid=(rows // tb,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((tb, f1, f2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f1, f2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + table_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return call, tables, (f1, f2)


# Sublane-DFT single-pass plans: n = f1 (sublane digit, VPU) * f2 (lane
# leaf, MXU dot). f1 stays small (the VPU level costs ~f1 complex MACs
# per element); f2 carries the dense MXU leaf (cost ~ 8*E*f2 MACs, so it
# wants to stay <= 512). tb = rows per grid step.
_PLANS_SL = {
    1 << 10: (8, 128, 256),
    1 << 11: (8, 256, 128),
    1 << 12: (16, 256, 64),
    1 << 13: (16, 512, 32),
    1 << 14: (16, 1024, 16),     # MXU-heavy; raced for the record
}


@functools.lru_cache(maxsize=None)
def _build_sl(n: int, sign: int, rows: int, interpret: bool,
              tb_override=None, scale: float = 1.0,
              rowmajor_out: bool = True):
    f1, f2, tb = _PLANS_SL[n]
    if tb_override:
        tb = tb_override
    while rows % tb:
        tb //= 2
    w2tr, w2ti = _leaf_stackedT_np(f2, sign)
    t1r, t1i = _twiddle_tiled_np(f1, f2, sign, tb, scale)
    wcr, wci = _wcol_np(f1, sign, tb)
    tables = [w2tr, w2ti, t1r, t1i, wcr, wci]
    kern = functools.partial(_vmemfft_sl_kernel, f1, f2, tb, rowmajor_out)
    table_specs = [pl.BlockSpec(t.shape, (lambda nd: lambda b: (0,) * nd)(t.ndim),
                                memory_space=pltpu.VMEM) for t in tables]
    oshape = (rows, f2, f1) if rowmajor_out else (rows, f1, f2)
    oblock = (tb,) + oshape[1:]
    call = pl.pallas_call(
        kern,
        grid=(rows // tb,),
        out_shape=tuple(jax.ShapeDtypeStruct(oshape, jnp.float32)
                        for _ in range(2)),
        in_specs=[
            pl.BlockSpec((tb, f1, f2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f1, f2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + table_specs,
        out_specs=tuple(pl.BlockSpec(oblock, lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(2)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return call, tables, (f1, f2)


@functools.lru_cache(maxsize=None)
def _build(n: int, sign: int, rows: int, interpret: bool, tb_override=None,
           plan_override=None, scale: float = 1.0, transposed: bool = False,
           gauss_mask: int = 0, lean: bool = False):
    f1, f2, f3, tb = plan_override or _PLANS[n]
    if tb_override:
        tb = tb_override
    while rows % tb:
        tb //= 2
    # Tables stay NUMPY in this cache: jnp constants created inside one
    # jit trace must not leak into another (UnexpectedTracerError).
    # fused normalization folded into the L2 twiddle table — see
    # _twiddle_np; everything after it (L3) is linear, so this is exact
    if lean:
        tables = []
        for lv, f in enumerate((f1, f2, f3)):
            if gauss_mask >> lv & 1:
                tables += list(_leaf_gauss_hilo_np(f, sign, tb))
            else:
                tables += list(_leaf_hilo_np(f, sign, tb))
        tables += [*_twiddle_np(f1, f2 * f3, sign),
                   *_twiddle_np(f2, f3, sign, scale)]
        kern = functools.partial(_vmemfft_lean_kernel, f1, f2, f3, tb,
                                 1.0, gauss_mask)
    elif gauss_mask:
        tables = []
        for lv, f in enumerate((f1, f2, f3)):
            if gauss_mask >> lv & 1:
                tables += list(_leaf_gauss_stacked_np(f, sign, tb))
            else:
                tables.append(_leaf_stacked_np(f, sign, tb))
        tables += [*_twiddle_np(f1, f2 * f3, sign),
                   *_twiddle_np(f2, f3, sign, scale)]
        kern = functools.partial(_vmemfft_tmix_kernel, f1, f2, f3, tb,
                                 1.0, gauss_mask)
    else:
        tables = [
            _leaf_stacked_np(f1, sign, tb),
            _leaf_stacked_np(f2, sign, tb),
            _leaf_stacked_np(f3, sign, tb),
            *_twiddle_np(f1, f2 * f3, sign),
            *_twiddle_np(f2, f3, sign, scale),
        ]
        body = _vmemfft_t_kernel if transposed else _vmemfft_kernel
        kern = functools.partial(body, f1, f2, f3, tb, 1.0)
    table_specs = [pl.BlockSpec(t.shape, (lambda nd: lambda b: (0,) * nd)(t.ndim),
                                memory_space=pltpu.VMEM) for t in tables]
    call = pl.pallas_call(
        kern,
        grid=(rows // tb,),
        out_shape=(
            jax.ShapeDtypeStruct((rows, f3, f2 * f1), jnp.float32),
            jax.ShapeDtypeStruct((rows, f3, f2 * f1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((tb, f1, f2 * f3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f1, f2 * f3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + table_specs,
        out_specs=(
            pl.BlockSpec((tb, f3, f2 * f1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f3, f2 * f1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return call, tables, (f1, f2, f3)


# Measured level choice for sizes present in both plan tables
# (tools/vmemfft_ab.py): 2 = two-level kernel, 3 = three-level,
# 5 = transposed-L2 three-level (one wide L2 dot instead of Mosaic's
# k1-loop of small matmuls), 6 = transposed-L2 with Gauss leaves on
# the _MASKS levels. r3 honest-chain races at 2^18
# (bench_results/vmemfft_ab.json): the transpose fix first flipped the
# size back to the kernel (t3_tb1 331.5 vs mm 351.9-369.7, kernel
# 5/5 rounds); the Gauss-L3 + folded-scale variant then won every
# round of two further windows (g3_tb1_m4 320.1-324.0 us, 5/5 and
# 2/5+3/5 with g3_tb2_m4) — L3's f3=128 fills the Gauss rows, so the
# 25% MAC cut is free there, while m6 (Gauss on the half-filled
# f2=64 L2) loses. The lean separate-dot variant (levels=7) loses
# ~12% — stacked contractions read the canvas once where 3 dots
# stream it 3x (measured negative, kept for the record).
_LEVELS = {
    1 << 13: 2,
    1 << 14: 2,
    1 << 18: 6,
}

# Default Gauss level mask per size for levels-6/7 kernels when the
# caller does not pass one (bit l = level l+1); measured per size.
_MASKS = {
    1 << 18: 4,
}


def fft_vmem(x: Cplx, sign: int, interpret: bool = False,
             tb_override: int = 0, levels: int = 0,
             rowmajor_out: bool = True, scale: float = 1.0,
             plan_override: Tuple[int, ...] | None = None,
             gauss_mask: int | None = None) -> Cplx:
    """Unnormalized DFT over the last axis, whole transform in VMEM.

    x: split (re, im) float32 planes, shape (..., n) with n in the plan
    tables. Matches fft_split(x, sign, "mm") within the bf16x3 error
    budget (~5e-5 relative over the matmul levels). ``levels`` forces the
    2- or 3-level kernel for sizes in both tables (0 = measured default);
    4 = hybrid no-batch-dot 3-level, 5 = transposed-L2 3-level,
    6 = transposed-L2 with Gauss 3-product leaves on the levels in
    ``gauss_mask`` (bit l = level l+1; 25% fewer MXU MACs per level,
    worth it only where the factor fills the MXU rows), 7 = lean
    transposed-L2 (separate hi/lo dots, no stacked-operand concats;
    honors ``gauss_mask`` like 6), 8 = front-2 hybrid (L1+L2 kernel
    gridded over rows x f3-chunks + one XLA f3-leaf pass — see
    fft_vmem_front2).
    ``scale`` multiplies the result INSIDE the kernel (folded into the
    L2 twiddle table host-side) — a normalization applied outside a
    pallas_call cannot be fused by XLA and costs a full extra HBM pass
    over the working set. ``gauss_mask=None`` uses the measured per-size
    default (_MASKS, falling back to all levels).
    """
    re, im = x
    n = re.shape[-1]
    if not supported(n):
        raise ValueError(f"vmem fft: unsupported size {n}")
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if not levels:
        levels = _LEVELS.get(n, 2 if n in _PLANS2 else 3)
    if levels == 8:                       # front-2 hybrid (kernel + XLA leaf)
        return fft_vmem_front2(
            x, sign, interpret=interpret, scale=scale,
            plan_override=plan_override,
            gauss_mask=(gauss_mask if gauss_mask is not None
                        else _MASKS_F2.get(n, 0)))
    if levels == 9:                       # sublane-DFT two-level kernel
        if n not in _PLANS_SL:
            raise ValueError(f"sublane-DFT kernel: unsupported size {n}")
        call, tables, (f1, f2) = _build_sl(n, sign, rows, interpret,
                                           tb_override or None, scale=scale,
                                           rowmajor_out=rowmajor_out)
        out_r, out_i = call(re.reshape(rows, f1, f2),
                            im.reshape(rows, f1, f2), *tables)
        if not rowmajor_out:
            # kernel emitted the (k1, k2)-major canvas; the spectrum is
            # (k2, k1)-major (k = k1 + f1*k2) — one XLA transpose pass
            out_r = jnp.transpose(out_r, (0, 2, 1))
            out_i = jnp.transpose(out_i, (0, 2, 1))
        return (out_r.reshape(lead + (n,)), out_i.reshape(lead + (n,)))
    if gauss_mask is None:
        gauss_mask = _MASKS.get(n, 7)
    if levels in (2, 4) and plan_override is not None:
        raise ValueError(
            f"plan_override applies to the 3-level kernels (levels 3/5/6/7"
            f"/8); the levels={levels} path uses its own fixed plan")
    if levels == 2 and n in _PLANS2:
        call, tables, (f1, f2) = _build2(n, sign, rows, interpret,
                                         tb_override or None,
                                         rowmajor_out=rowmajor_out,
                                         scale=scale)
        re3 = re.reshape(rows, f1, f2)
        im3 = im.reshape(rows, f1, f2)
        out_r, out_i = call(re3, im3, *tables)
        if not rowmajor_out:
            # kernel emitted X^T (k2, k1, rows); one XLA transpose pass
            out_r = jnp.transpose(out_r, (2, 0, 1))
            out_i = jnp.transpose(out_i, (2, 0, 1))
    elif levels == 4 and n in _PLANS3H:
        call, tables, (f1, f2, f3) = _build3h(n, sign, rows, interpret,
                                              tb_override or None,
                                              scale=scale)
        re3 = re.reshape(rows, f1, f2 * f3)
        im3 = im.reshape(rows, f1, f2 * f3)
        out_r, out_i = call(re3, im3, *tables)
        # (k3, k2, rows*k1) -> row-major (rows, n): one XLA transpose pass
        out_r = jnp.transpose(out_r.reshape(f3, f2, rows, f1), (2, 0, 1, 3))
        out_i = jnp.transpose(out_i.reshape(f3, f2, rows, f1), (2, 0, 1, 3))
    else:
        if plan_override is not None:
            f1p, f2p, f3p = plan_override[:3]
            if f1p * f2p * f3p != n:
                raise ValueError(f"plan_override {plan_override} != n={n}")
            if len(plan_override) == 3:       # default tb from the tuned plan
                plan_override = (f1p, f2p, f3p, _PLANS[n][3])
            plan_override = tuple(plan_override)
        call, tables, (f1, f2, f3) = _build(n, sign, rows, interpret,
                                            tb_override or None,
                                            plan_override=plan_override,
                                            scale=scale,
                                            transposed=levels in (5, 6, 7),
                                            gauss_mask=(gauss_mask
                                                        if levels in (6, 7)
                                                        else 0),
                                            lean=levels == 7)
        re3 = re.reshape(rows, f1, f2 * f3)
        im3 = im.reshape(rows, f1, f2 * f3)
        out_r, out_i = call(re3, im3, *tables)
    return out_r.reshape(lead + (n,)), out_i.reshape(lead + (n,))
