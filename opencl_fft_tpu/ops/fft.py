"""Complex-to-complex 1-D FFT, TPU-native.

Capability parity with the reference ``Clcfft`` (``cl_fft.h:29-70``,
``cl_fft.cpp:44-161``): power-of-two sizes, forward transform scaled by 1/N
(the reference folds the scaling into the final butterfly stage,
``cl_fft.cpp:39-40``), inverse transform unnormalized, f32 complex data.

The implementation is deliberately NOT a translation of the reference's
OpenCL launch structure (bit-reversal pass + log2(N) separate butterfly
dispatches, ``cl_fft.cpp:138-151``). Complex data is carried as a split
(re, im) pair of float32 arrays — the TPU backend has no complex-dtype
kernels, and split planes keep 128-lane-friendly layouts. Three paths:

``mm``        Recursive Bailey four-step decomposition N = N1*N2 with dense
              DFT matrices at the leaves. A complex leaf DFT is ONE real
              matmul against the 2x2 block matrix [[U, V], [-V, U]] — pure
              MXU work, O(log_r N) HBM passes instead of log2 N.
``stockham``  Radix-2 Stockham autosort: log2(N) fused self-sorting vector
              stages on the VPU. Small-N path and exactness cross-check.
``vmem``      Pallas kernels (pallas/vmemfft.py): whole transform in VMEM
              (2- or 3-level mixed-radix) — one HBM read + one write per
              row. Auto mode routes the sizes where the interleaved A/B
              beats the (re-tuned) ``mm`` path (_VMEM_AUTO_SIZES —
              currently none after the r3 re-tune; opt-in only).
``xla``       ``jnp.fft`` builtin — host/CPU comparison only (the axon TPU
              backend does not implement the FFT op).

Non-power-of-two sizes run through a Bluestein chirp-z built on the ``mm``
core (beyond parity — the reference rounds sizes up instead). All paths are
batched over leading axes and jit-compatible (static shapes, no
data-dependent control flow).
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.numerics import ilog2, is_pow2
from .cplx import Cplx, from_complex, to_complex

# Largest DFT leaf solved by a single dense matmul by default. 128 matches
# the MXU systolic-array edge; tuned plans may force direct leaves up to
# _MAX_DIRECT.
MAX_RADIX = 128
_MAX_DIRECT = 1024

_HIGHEST = jax.lax.Precision.HIGHEST

# Matmul precision for the DFT leaves. HIGHEST = full f32 (6-pass bf16,
# ~31 TFLOP/s on the target chip); HIGH = bf16x3 (~61 TFLOP/s, ~1.5e-5
# relative error per matmul stage). Measured on-chip (r2): HIGH leaves are
# 1.3-3x faster end-to-end on the 2^14..2^20 sweep. Default policy
# ("auto"): HIGH for leaves >= _FAST_LEAF_MIN — large transforms get the
# speed while the small leaves inside the streaming convolver (plan 1024
# -> 32x32) stay exact, keeping the test_cfft/test_rfft 1e-5 parity
# budget untouched. set_fast_math forces HIGH ("on") or HIGHEST ("off")
# everywhere. tools/tpu_smoke.py pins the auto-mode roundtrip error
# budget on hardware.
_FAST_MODE = "auto"            # process-wide policy (set_fast_math)
_FAST_TLS = threading.local()  # per-thread override (exact_precision) —
#                                the realtime pipeline traces on a worker
#                                thread concurrently with the main thread,
#                                so the trace-scoped override must not leak
#                                across threads
_FAST_LEAF_MIN = 64


def _fast_mode() -> str:
    return getattr(_FAST_TLS, "mode", None) or _FAST_MODE


def set_fast_math(enabled: "Optional[bool] | str") -> None:
    """Leaf-matmul precision policy: True = bf16x3 (Precision.HIGH)
    everywhere, False = full f32 everywhere, None = size-gated default
    (HIGH only for leaves >= 64), "turbo" = pure-bf16 leaves
    (Precision.DEFAULT, ~3x the bf16x3 MXU rate) for leaves >= 64.

    "turbo" is an explicit accuracy trade (~4e-3 relative per matmul
    stage vs ~1.5e-5 for bf16x3) for spectral display / analysis
    workloads, in the spirit of ``PconvConfig(ring_dtype="bf16")``. The
    convolution engines are unaffected: they wrap their internal
    transforms in ``exact_precision()``, which overrides any process
    mode. tools/fft_turbo_ab.py measures the speed/error trade on-chip."""
    global _FAST_MODE
    if isinstance(enabled, str):
        # strings must name a mode exactly — a truthy fallthrough would
        # turn set_fast_math("off") into bf16x3-everywhere silently
        aliases = {"turbo": "turbo", "on": "on", "off": "off", "auto": "auto"}
        mode = aliases.get(enabled.lower())
        if mode is None:
            raise ValueError(
                f"set_fast_math: unknown mode {enabled!r} "
                f"(expected True/False/None or one of {sorted(aliases)})")
        _FAST_MODE = mode
        return
    _FAST_MODE = "auto" if enabled is None else ("on" if enabled else "off")


def _leaf_precision(n: int):
    mode = _fast_mode()
    if mode == "on":
        return jax.lax.Precision.HIGH
    if mode == "off":
        return _HIGHEST
    if mode == "turbo":
        return (jax.lax.Precision.DEFAULT if n >= _FAST_LEAF_MIN
                else _HIGHEST)
    return jax.lax.Precision.HIGH if n >= _FAST_LEAF_MIN else _HIGHEST


@contextlib.contextmanager
def exact_precision():
    """Force full-f32 leaf matmuls inside the context (trace-time scope,
    THREAD-LOCAL — a concurrently tracing thread keeps its own policy).

    The streaming convolution engine wraps its internal transforms in this:
    bf16x3 (Precision.HIGH) results differ between batched and single-item
    shapes on TPU (XLA picks shape-dependent pass structures), which would
    break the engine's chunked == sequential equivalence guarantee."""
    old = getattr(_FAST_TLS, "mode", None)
    _FAST_TLS.mode = "off"
    try:
        yield
    finally:
        _FAST_TLS.mode = old


# Tuned factorization plans: n -> n1 (left factor of the four-step split),
# or 0 to force a direct dense leaf (n <= _MAX_DIRECT). Filled by
# tools/autotune_fft.py (measured on the target chip) via _fft_plans.py.
# Two operating points (VERDICT r1: plans tuned at one point regressed the
# other): _SPLIT_OVERRIDES is tuned at large working sets (the batched
# throughput benches), _SPLIT_OVERRIDES_SMALL at tiny batches (the
# streaming convolver's per-block transforms). The bucket is chosen by
# total trace-time element count; sizes missing from the small table fall
# back to the large one, then to the balanced default.
_SPLIT_OVERRIDES: dict = {}
_SPLIT_OVERRIDES_SMALL: dict = {}
_INNER_OVERRIDES: dict = {}         # non-root factors only (see
#                                     _plan_lookup's docstring)
_GAUSS_BY_ROOT: dict = {}           # root n -> Gauss-leaf threshold (see
#                                     _leaf_dft / _fft_plans.GAUSS)
_FLAT_PLANS: dict = {}              # n -> factor tuple for the
#                                     zero-transpose flat chain
#                                     (_fft_mm_flat); measured adoption
_SMALL_WS_ELEMS = 1 << 18           # < 2MB split working set => "small"

try:                                       # tuned tables are optional
    from . import _fft_plans as _P
    _SPLIT_OVERRIDES.update(getattr(_P, "PLANS", {}))
    _SPLIT_OVERRIDES_SMALL.update(getattr(_P, "PLANS_SMALL", {}))
    _INNER_OVERRIDES.update(getattr(_P, "PLANS_INNER", {}))
    _GAUSS_BY_ROOT.update(getattr(_P, "GAUSS", {}))
    _FLAT_PLANS.update(getattr(_P, "FLAT", {}))
except ImportError:
    pass


def _plan_lookup(n: int, elems: int, inner: bool = False):
    """Tuned left factor for an n-point transform over `elems` total
    elements; None if untuned.

    ``inner`` marks a non-root factor inside a larger four-step tree.
    The standalone tables were tuned at the ROOT operating point, where
    the factor's own HBM passes dominate — but as an inner node the same
    size sits between a digit transpose and a twiddle pass, so its best
    split can differ (e.g. PLANS[512]=8 routes the 8-leaf through the
    swapaxes path, fine standalone, transpose-heavy inside 2^16).
    _INNER_OVERRIDES wins for inner nodes when present; it is filled by
    on-chip A/Bs (tools/fft_plan16.py)."""
    if inner and n in _INNER_OVERRIDES:
        return _INNER_OVERRIDES[n]
    if elems < _SMALL_WS_ELEMS and n in _SPLIT_OVERRIDES_SMALL:
        return _SPLIT_OVERRIDES_SMALL[n]
    if n in _SPLIT_OVERRIDES:
        return _SPLIT_OVERRIDES[n]
    return None


# ---------------------------------------------------------------------------
# Host-precomputed tables (float64 trig, cast to f32 — same accuracy recipe
# as the reference's host-side twiddle fill, cl_fft.cpp:86-91).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _leaf_matrix_np(n: int, sign: int, npdt=np.float32) -> np.ndarray:
    """Real 2n x 2n block matrix for a complex n-point DFT in one matmul.

    With W[j,k] = exp(sign*2i*pi*j*k/n) = U + iV, the complex product
    (re + i im) @ W equals [re im] @ [[U, V], [-V, U]].
    """
    jk = np.outer(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * jk / n)
    u, v = w.real, w.imag
    top = np.concatenate([u, v], axis=1)
    bot = np.concatenate([-v, u], axis=1)
    return np.concatenate([top, bot], axis=0).astype(npdt)


@functools.lru_cache(maxsize=None)
def _leaf_gauss_np(n: int, sign: int, npdt=np.float32) -> Tuple[np.ndarray, ...]:
    """Gauss-trick matrices (U, U+V, V-U) for a 3-matmul complex DFT leaf.

    With W = U + iV and out_re = re@U - im@V, out_im = re@V + im@U:
        m1 = (re+im)@U,  m2 = im@(U+V),  m3 = re@(V-U)
        out_re = m1 - m2,  out_im = m1 + m3
    i.e. 3 real n x n matmuls instead of the one (2n x 2n) block matmul of
    _leaf_matrix_np — 25% fewer MXU FLOPs. Worth it only where the leaf is
    MXU-bound (large n under Precision.HIGH); gated by _GAUSS_MIN_N, set
    from interleaved on-chip A/Bs (tools/fft_gauss_ab.py).
    """
    jk = np.outer(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * jk / n)
    u, v = w.real, w.imag
    return u.astype(npdt), (u + v).astype(npdt), (v - u).astype(npdt)


@functools.lru_cache(maxsize=None)
def _fourstep_twiddle_np(n1: int, n2: int, sign: int, k1_major: bool = False,
                         npdt=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Four-step twiddle exp(sign*2i*pi*n2_idx*k1/N), split.

    Shape (n2, k1) by default, or (k1, n2) when k1_major (the
    transpose-free first-factor layout)."""
    n = n1 * n2
    if k1_major:
        ph = np.outer(np.arange(n1, dtype=np.float64),
                      np.arange(n2, dtype=np.float64))
    else:
        ph = np.outer(np.arange(n2, dtype=np.float64),
                      np.arange(n1, dtype=np.float64))
    w = np.exp(sign * 2j * np.pi * ph / n)
    return w.real.astype(npdt), w.imag.astype(npdt)


@functools.lru_cache(maxsize=None)
def _flat_twiddle_np(factors: Tuple[int, ...], lv: int, sign: int,
                     npdt=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Natural-order-output twiddle after level ``lv`` of a flat chain.

    With factors (f1..fL) and digits k_{lv+1}..k_1 already produced
    (axis order of the data at that point), the coupling of the NEXT
    input digit n_{lv+2} to everything produced so far is one table
        T[k_{lv+1}, ..., k_1, n] = exp(sign*2i*pi * kappa * n / P)
    where kappa = sum_j k_{j+1} * (f1*...*f_j) is the digit-composed
    output index so far and P = f1*...*f_{lv+2}. This is the same total
    phase as the recursive four-step's (root twiddle x inner twiddles),
    just partitioned per level so every multiply is elementwise in the
    flat chain's native layout (no transposes anywhere).
    """
    fs = factors
    shape = tuple(fs[j] for j in range(lv, -1, -1))     # (f_{lv+1},..,f1)
    kappa = np.zeros(shape, np.float64)
    for ax, j in enumerate(range(lv, -1, -1)):
        place = float(int(np.prod(fs[:j], dtype=np.int64)))
        idx = np.arange(fs[j], dtype=np.float64) * place
        bshape = [1] * len(shape)
        bshape[ax] = fs[j]
        kappa = kappa + idx.reshape(bshape)
    nnext = np.arange(fs[lv + 1], dtype=np.float64)
    P = float(int(np.prod(fs[:lv + 2], dtype=np.int64)))
    ph = kappa[..., None] * nnext / P
    w = np.exp(sign * 2j * np.pi * ph)
    return w.real.astype(npdt), w.imag.astype(npdt)


@functools.lru_cache(maxsize=None)
def _stage_twiddle_np(m: int, sign: int, npdt=np.float32
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Stockham stage twiddle w[j] = exp(sign*2i*pi*j/(2m)), j < m, split."""
    j = np.arange(m, dtype=np.float64)
    w = np.exp(sign * 2j * np.pi * j / (2 * m))
    return w.real.astype(npdt), w.imag.astype(npdt)


def _split_factors(n: int, elems: int, inner: bool = False
                   ) -> Tuple[int, int]:
    """Power-of-two factorization n = n1 * n2 (tuned table, else balanced).

    The balanced default recurses both factors to leaves <= MAX_RADIX in
    O(log log n) levels (e.g. 2^20 -> (1024, 1024) -> (32, 32) leaves).
    """
    n1 = _plan_lookup(n, elems, inner)
    if n1:
        return n1, n // n1
    k = ilog2(n)
    n1 = 1 << (k // 2)
    return n1, n // n1


def _is_leaf(n: int, elems: int, inner: bool = False) -> bool:
    if n <= MAX_RADIX:
        return True
    return n <= _MAX_DIRECT and _plan_lookup(n, elems, inner) == 0


# ---------------------------------------------------------------------------
# Implementation: recursive four-step matmul FFT (MXU path)
# ---------------------------------------------------------------------------

def _leaf_dft(re, im, sign, axis, gauss_min=None):
    """Dense complex DFT over `axis` (-1 or -2) as real matmuls.

    Two forms, both transpose-free for axis=-2 (the split planes
    concatenate/contract along the factor axis directly — measured ~20%
    faster at 2^20 than transposing the factor to the last axis first):

    - block: ONE (2n x 2n) matmul against [[U, V], [-V, U]] (4-matmul FLOPs,
      minimum HBM traffic — one concat read, one split write).
    - gauss: THREE n x n matmuls (_leaf_gauss_np; 25% fewer MXU FLOPs, a
      little more elementwise traffic). Wins where the leaf is MXU-bound:
      Precision.HIGH and n >= gauss_min (per-root measured gate,
      _GAUSS_BY_ROOT).
    """
    if gauss_min is None:
        gauss_min = _GAUSS_MIN_N
    n = re.shape[axis]
    npdt = np.dtype(re.dtype)
    prec = _HIGHEST if npdt == np.float64 else _leaf_precision(n)
    if prec == jax.lax.Precision.HIGH and n >= gauss_min:
        u, upv, vmu = (jnp.asarray(a) for a in _leaf_gauss_np(n, sign, npdt))
        eq = "...n,nk->...k" if axis == -1 else "...nj,nk->...kj"
        m1 = jnp.einsum(eq, re + im, u, precision=prec)
        m2 = jnp.einsum(eq, im, upv, precision=prec)
        m3 = jnp.einsum(eq, re, vmu, precision=prec)
        return m1 - m2, m1 + m3
    w = jnp.asarray(_leaf_matrix_np(n, sign, npdt))
    z = jnp.concatenate([re, im], axis=axis)
    if axis == -1:
        y = jnp.einsum("...n,nk->...k", z, w, precision=prec)
        return y[..., :n], y[..., n:]
    y = jnp.einsum("...nj,nk->...kj", z, w, precision=prec)
    return y[..., :n, :], y[..., n:, :]


def _leaf_dft_out_t(re, im, sign, gauss_min=None):
    """Dense DFT over the LAST axis, output transposed to (..., k, j).

    Fuses the four-step's final swapaxes into the second leaf matmul
    (einsum emits the transposed layout directly) — saves one full HBM
    read+write pass over the working set, which is the dominant cost for
    the 2^16..2^20 sweep (measured HBM-bound at ~600 GB/s). Honors the
    same Gauss 3-matmul gate as _leaf_dft."""
    if gauss_min is None:
        gauss_min = _GAUSS_MIN_N
    n = re.shape[-1]
    npdt = np.dtype(re.dtype)
    prec = _HIGHEST if npdt == np.float64 else _leaf_precision(n)
    if prec == jax.lax.Precision.HIGH and n >= gauss_min:
        u, upv, vmu = (jnp.asarray(a) for a in _leaf_gauss_np(n, sign, npdt))
        eq = "...jn,nk->...kj"
        m1 = jnp.einsum(eq, re + im, u, precision=prec)
        m2 = jnp.einsum(eq, im, upv, precision=prec)
        m3 = jnp.einsum(eq, re, vmu, precision=prec)
        return m1 - m2, m1 + m3
    w = jnp.asarray(_leaf_matrix_np(n, sign, npdt))
    z = jnp.concatenate([re, im], axis=-1)
    y = jnp.einsum("...jn,nk->...kj", z, w, precision=prec)
    return y[..., :n, :], y[..., n:, :]


def _fft_mm(x: Cplx, sign: int, inner: bool = False,
            gauss_min: Optional[int] = None) -> Cplx:
    """Unnormalized DFT over the last axis via recursive four-step
    matmuls. ``inner`` marks non-root calls (factor transforms inside a
    larger tree) — they consult _INNER_OVERRIDES first. The Gauss-leaf
    threshold is chosen ONCE at the root from _GAUSS_BY_ROOT (the
    measured per-size table: the same 128-leaf is MXU-bound inside the
    2^18 tree but HBM-bound inside 2^20's) and threaded down."""
    re, im = x
    n = re.shape[-1]
    if gauss_min is None:
        gauss_min = _GAUSS_BY_ROOT.get(n, _GAUSS_MIN_N)
    # per-LEVEL Gauss (VERDICT r4 #9): a (g1, g2) pair applies g1 to the
    # first factor's leaf/subtree and g2 to the second — needed to race
    # Gauss on exactly one level of a balanced tree (e.g. 2^16 = 256x256,
    # where a size threshold cannot distinguish the levels).
    if isinstance(gauss_min, tuple):
        g1, g2 = gauss_min
    else:
        g1 = g2 = gauss_min
    elems = re.size            # static at trace time; constant down the
    #                            recursion, so one plan bucket per call tree
    if _is_leaf(n, elems, inner):
        return _leaf_dft(re, im, sign, -1, g1)
    n1, n2 = _split_factors(n, elems, inner)
    batch = re.shape[:-1]

    def shape_to(a, trailing):
        return a.reshape(batch + trailing)

    re = shape_to(re, (n1, n2))
    im = shape_to(im, (n1, n2))
    if _is_leaf(n1, elems, True) and n1 >= _AXIS2_MIN_N1:
        # transpose-free first factor: contract n1 over axis -2 directly
        # (wins ~20% at 2^20; hurts small transforms, hence the gate)
        re, im = _leaf_dft(re, im, sign, -2, g1)         # (..., k1, n2)
    else:
        re = jnp.swapaxes(re, -1, -2)                    # (..., n2, n1)
        im = jnp.swapaxes(im, -1, -2)
        re, im = _fft_mm((re, im), sign, True, g1)       # DFT over n1
        re = jnp.swapaxes(re, -1, -2)                    # (..., k1, n2)
        im = jnp.swapaxes(im, -1, -2)
    twr, twi = _fourstep_twiddle_np(n1, n2, sign, k1_major=True,
                                    npdt=np.dtype(re.dtype))
    twr, twi = jnp.asarray(twr), jnp.asarray(twi)
    re, im = re * twr - im * twi, re * twi + im * twr
    if _is_leaf(n2, elems, True) and n2 >= _OUT_T_MIN_N2:
        re, im = _leaf_dft_out_t(re, im, sign, g2)       # (..., k2, k1)
    else:
        re, im = _fft_mm((re, im), sign, True, g2)       # DFT over n2
        re = jnp.swapaxes(re, -1, -2)                    # (..., k2, k1)
        im = jnp.swapaxes(im, -1, -2)
    return shape_to(re, (n,)), shape_to(im, (n,))


def _fft_mm_flat(x: Cplx, sign: int, factors: Tuple[int, ...],
                 gauss_min: Optional[int] = None) -> Cplx:
    """Zero-transpose multi-level DFT: operand-order dot_general chain.

    Same leaf matrices and total twiddle phase as the recursive four-step
    (_fft_mm), but the digit reordering that _fft_mm pays as explicit
    ``swapaxes`` passes is absorbed into the OUTPUT ORDER of each level's
    dot_general: the leaf matrix rides as a batch-broadcast LHS, so the
    fresh spectral digit lands immediately after the batch axis and the
    previously produced digits shift right — after the last level the
    layout is (b, k_L, ..., k_1) == natural order, with ZERO transpose
    passes. This is the VMEM kernel's zero-relayout dataflow
    (pallas/vmemfft.py design rules) lifted to the XLA level, where the
    dots run at full MXU speed: L levels == L fused HBM passes total.

    Each factor must be a dense leaf (pow2, <= _MAX_DIRECT). Twiddles
    (_flat_twiddle_np) are elementwise in the chain's native layout and
    fuse into the adjacent dot. Honors the same per-leaf precision and
    Gauss 3-matmul gates as _fft_mm. Replaces the per-stage launch
    structure of the reference (cl_fft.cpp:138-151) like the other
    paths; adopted per size by measured A/B only (_FLAT_PLANS).

    Measured r3 (bench_results/fft_flat_ab.json): LOSES to the
    recursive four-step at 2^18 on every plan (best 416.8 us vs cur
    371.0, 4/4 rounds) — XLA lowers batch-dim dots with middle-axis
    contractions worse than the swapaxes+leaf recursion (whose
    transposes it already folds), so _FLAT_PLANS stays empty and this
    path is opt-in documentation of the negative result.
    """
    re, im = x
    n = re.shape[-1]
    assert int(np.prod(factors)) == n, (factors, n)
    if gauss_min is None:
        gauss_min = _GAUSS_BY_ROOT.get(n, _GAUSS_MIN_N)
    npdt = np.dtype(re.dtype)
    lead = re.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    L = len(factors)
    rest = n // factors[0]
    re = re.reshape(b, factors[0], rest)
    im = im.reshape(b, factors[0], rest)
    # loop invariant entering level lv: shape (b, k_lv, ..., k_1, f, R)
    # with f = factors[lv] the fresh input digit at axis 1+lv and R the
    # untransformed remainder (the R axis is absent once it reaches 1,
    # keeping the minor/lane dim a real factor, never a padded 1).
    for lv, f in enumerate(factors):
        prec = _HIGHEST if npdt == np.float64 else _leaf_precision(f)
        c_ax = 1 + lv
        dims = (((2,), (c_ax,)), ((0,), (0,)))
        if prec == jax.lax.Precision.HIGH and f >= gauss_min:
            u, upv, vmu = (jnp.broadcast_to(jnp.asarray(a), (b, f, f))
                           for a in _leaf_gauss_np(f, sign, npdt))
            m1 = jax.lax.dot_general(u, re + im, dims, precision=prec)
            m2 = jax.lax.dot_general(upv, im, dims, precision=prec)
            m3 = jax.lax.dot_general(vmu, re, dims, precision=prec)
            re, im = m1 - m2, m1 + m3
        else:
            # _leaf_matrix_np is the data-as-LHS block [[U, V], [-V, U]];
            # with the leaf as LHS the column form [[U, -V], [V, U]] is
            # needed — U, V are symmetric, so that is just the transpose.
            w = jnp.broadcast_to(
                jnp.asarray(_leaf_matrix_np(f, sign, npdt).T.copy()),
                (b, 2 * f, 2 * f))
            z = jnp.concatenate([re, im], axis=c_ax)
            y = jax.lax.dot_general(w, z, dims, precision=prec)
            re, im = jnp.split(y, 2, axis=1)
        # layout now (b, k_{lv+1}, k_lv, ..., k_1[, R]); split the next
        # input digit out of R and apply the level twiddle elementwise
        if lv + 1 < L:
            fnext = factors[lv + 1]
            dshape = (b,) + tuple(factors[j] for j in range(lv, -1, -1))
            rnext = re.shape[-1] // fnext if re.ndim == len(dshape) + 1 else 1
            twr, twi = _flat_twiddle_np(tuple(factors), lv, sign, npdt)
            if rnext > 1:
                re = re.reshape(dshape + (fnext, rnext))
                im = im.reshape(dshape + (fnext, rnext))
                twr = jnp.asarray(twr)[None, ..., None]
                twi = jnp.asarray(twi)[None, ..., None]
            else:
                re = re.reshape(dshape + (fnext,))
                im = im.reshape(dshape + (fnext,))
                twr = jnp.asarray(twr)[None, ...]
                twi = jnp.asarray(twi)[None, ...]
            re, im = re * twr - im * twi, re * twi + im * twr
    return re.reshape(lead + (n,)), im.reshape(lead + (n,))


# ---------------------------------------------------------------------------
# Implementation: radix-2 Stockham autosort (VPU path)
# ---------------------------------------------------------------------------

def _fft_stockham(x: Cplx, sign: int) -> Cplx:
    """Unnormalized DFT over the last axis, radix-2 DIF Stockham.

    Replaces the reference's bit-reversal + log2(N) butterfly dispatches
    (cl_fft.cpp:138-151) with log2(N) fused, self-sorting vector stages.
    """
    re, im = x
    n = re.shape[-1]
    stages = ilog2(n)
    batch = re.shape[:-1]
    re = re.reshape(batch + (1, n))
    im = im.reshape(batch + (1, n))
    m = n
    for _ in range(stages):
        m //= 2
        tr, ti = _stage_twiddle_np(m, sign, np.dtype(re.dtype))
        tr, ti = jnp.asarray(tr), jnp.asarray(ti)
        ar = re[..., :m] + re[..., m:]
        ai = im[..., :m] + im[..., m:]
        dr = re[..., :m] - re[..., m:]
        di = im[..., :m] - im[..., m:]
        br = dr * tr - di * ti
        bi = dr * ti + di * tr
        # New parity bit becomes the MSB of the row index => natural order out.
        rows = re.shape[-2] * 2
        re = jnp.stack([ar, br], axis=-3).reshape(batch + (rows, m))
        im = jnp.stack([ai, bi], axis=-3).reshape(batch + (rows, m))
    return re.reshape(batch + (n,)), im.reshape(batch + (n,))


# ---------------------------------------------------------------------------
# Implementation: Bluestein chirp-z for arbitrary (non-power-of-two) sizes.
# Beyond-parity capability: the reference is power-of-two only (its opcode
# layer rounds sizes up, csound/opcode.cpp:30-35).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bluestein_tables_np(n: int, sign: int, npdt=np.float32
                         ) -> Tuple[np.ndarray, ...]:
    """Chirp tables for an n-point DFT via an m-point circular convolution.

    With w = exp(sign*2i*pi/n): X[k] = c[k] * sum_n (x[n] c[n]) * conj_c[k-n]
    where c[j] = w^{j^2/2}. Phases use j^2 mod 2n in f64 to avoid large-angle
    trig error. Returns (chirp, B_spectrum) with m = np2(2n - 1).
    """
    m = 2
    while m < 2 * n - 1:
        m <<= 1
    j = np.arange(n, dtype=np.int64)
    phase = (j * j) % (2 * n)
    c = np.exp(sign * 1j * np.pi * phase.astype(np.float64) / n)
    b = np.zeros(m, np.complex128)
    b[:n] = np.conj(c)
    b[m - n + 1:] = np.conj(c[1:][::-1])          # b[-j] = conj(c[j])
    B = np.fft.fft(b)                             # host precompute, f64
    cdt = np.complex128 if np.dtype(npdt) == np.float64 else np.complex64
    return (c.astype(cdt), B.astype(cdt), m)


def _fft_bluestein(x: Cplx, sign: int, impl: str) -> Cplx:
    re, im = x
    n = re.shape[-1]
    c, B, m = _bluestein_tables_np(n, sign, np.dtype(re.dtype))
    cr, ci = jnp.asarray(c.real), jnp.asarray(c.imag)
    Br, Bi = jnp.asarray(B.real), jnp.asarray(B.imag)
    ar = re * cr - im * ci
    ai = re * ci + im * cr
    pad = [(0, 0)] * (ar.ndim - 1) + [(0, m - n)]
    Ar, Ai = _fft_dispatch((jnp.pad(ar, pad), jnp.pad(ai, pad)), -1, impl)
    Yr = Ar * Br - Ai * Bi
    Yi = Ar * Bi + Ai * Br
    yr, yi = _fft_dispatch((Yr, Yi), +1, impl)
    yr, yi = yr[..., :n] / m, yi[..., :n] / m
    return yr * cr - yi * ci, yr * ci + yi * cr


# ---------------------------------------------------------------------------
# Dispatcher + reference-normalized entry points
# ---------------------------------------------------------------------------


def _use_vmem_kernel(x: Cplx, sign: int) -> bool:
    """auto-mode gate for the VMEM-resident Pallas FFT (pallas/vmemfft.py).

    Measured policy (interleaved A/B on the target chip): the r3
    plan-table re-tune plus the fused-scale epilogue first flipped every
    size to the four-step mm path; the transposed-L2 kernel variant then
    won 2^18 back decisively (see the _VMEM_AUTO_SIZES table comment and
    bench_results/vmemfft_ab.json). The kernel is inherently bf16x3, so
    it is skipped when exact f32 leaves are in force
    (exact_precision() / set_fast_math(False)) and under "turbo"
    (pure-bf16 mm leaves outrun the kernel's bf16x3 passes)."""
    if _fast_mode() in ("off", "turbo"):
        return False
    re = x[0]
    if re.dtype != jnp.float32:
        return False
    n = re.shape[-1]
    if n not in _VMEM_AUTO_SIZES or re.size < _SMALL_WS_ELEMS:
        return False
    from .pallas import vmemfft
    if not vmemfft.supported(n):
        return False
    return jax.default_backend() != "cpu"


def _fft_vmem(x: Cplx, sign: int, scale: float = 1.0) -> Cplx:
    from .pallas import vmemfft
    if x[0].dtype != jnp.float32:
        raise ValueError("impl='vmem' is float32-only (bf16x3 MXU kernel)")
    interpret = jax.default_backend() == "cpu"
    return vmemfft.fft_vmem(x, sign, interpret=interpret, scale=scale)


def _fft_dispatch(x: Cplx, sign: int, impl: str, scale: float = 1.0) -> Cplx:
    """Power-of-two dispatch (impl already validated).

    ``scale`` semantics: result is scale * DFT(x). On the vmem kernel
    path it is applied in the kernel epilogue (an outside multiply would
    cost a full extra HBM pass — XLA cannot fuse into a pallas_call
    output); on the XLA paths a trailing multiply fuses into the last
    matmul/transpose for free.
    """
    if impl == "vmem":
        return _fft_vmem(x, sign, scale)
    out = None
    if impl in ("auto", "mm", "flat"):
        n = x[0].shape[-1]
        flat_plan = _FLAT_PLANS.get(n)
        if impl == "auto" and n <= _STOCKHAM_MAX:
            out = _fft_stockham(x, sign)
        elif impl == "auto" and _use_vmem_kernel(x, sign):
            return _fft_vmem(x, sign, scale)
        elif (impl == "flat" or (impl == "auto" and
                                 x[0].size >= _SMALL_WS_ELEMS)) \
                and flat_plan and len(flat_plan) >= 2:
            out = _fft_mm_flat(x, sign, tuple(flat_plan))
        else:
            # impl="flat" without a plan entry falls back to mm (the
            # Bluestein core also lands here for padded sizes)
            out = _fft_mm(x, sign)
    elif impl == "stockham":
        out = _fft_stockham(x, sign)
    else:
        z = to_complex(x)
        n = x[0].shape[-1]
        z = jnp.fft.fft(z) if sign == -1 else jnp.fft.ifft(z) * n
        out = from_complex(z)
    if scale != 1.0:
        out = (out[0] * scale, out[1] * scale)
    return out

_IMPLS = ("auto", "mm", "stockham", "xla", "vmem", "flat")

# Auto-mode routing set for the VMEM-resident Pallas kernel, from
# interleaved A/B vs the mm path on the target chip
# (tools/vmemfft_ab.py -> bench_results/vmemfft_ab.json). r3 history:
# the plan-table re-tune (see _fft_plans.py) first flipped every size
# to mm — the original kernel's L2 lowers as a k1-loop of small
# matmuls (stage attribution in bench_results/vmemfft_profile.json).
# The transposed-L2 variant (vmemfft._vmemfft_t_kernel, levels=5)
# fixed that: at 2^18 the kernel wins every honest-chain round
# (t3_tb1/tb2 331.6/333.6 us vs mm 369.7, kernel variants 5/5 rounds,
# ~10 s Mosaic compile), so 2^18 routes to the kernel. At 2^16 mm
# wins outright (237.4 vs t3 307.5+, 5/5 rounds) — the balanced
# 256x256 Gauss-leaf tree is too strong there. The 2-level
# small-size kernels LOSE to the re-tuned mm everywhere (e.g. 2^12:
# mm-n1=64 168 us vs kernel 434). Everything stays available via
# impl="vmem". The kernel's residual ceiling is VPU-bound: the
# Dekker hi/lo stacking costs ~9 VPU ops/elem/level and Mosaic has
# no native Precision.HIGH dots ("Unsupported dot precision: HIGH"),
# so the explicit 6f-stack is the only bf16x3 form available
# in-kernel (see vmemfft_profile.json stack_depth attribution).
_VMEM_AUTO_SIZES: set = {1 << 18}

# Below this size, one matmul leaf is a full transform; the Stockham path
# wins only for tiny batch*N where matmul setup dominates.
_STOCKHAM_MAX = 8

# Contract the first four-step factor over axis -2 (transpose-free) only
# when the factor is at least this large: measured ~20% faster at 2^20
# (n1=128/256) but ~2x slower for the small per-block transforms inside the
# streaming convolver (n1=8..16).
_AXIS2_MIN_N1 = 64

# Default Gauss-leaf threshold for root sizes NOT in _GAUSS_BY_ROOT (the
# measured per-root table from _fft_plans.GAUSS). Large dense leaves are
# MXU-bound under bf16x3 (a 256-leaf level at 2^16 is ~280 us of pure
# matmul at the measured ~61 TFLOP/s), so trading elementwise adds for a
# quarter of the matmul work wins there; HBM-bound trees keep the block
# form (one concat read + one split write is the traffic minimum).
# Unmeasured sizes default OFF; tools/fft_gauss_ab.py races thresholds
# interleaved -> bench_results/fft_gauss_ab.json.
_GAUSS_MIN_N = 1 << 30

# Emit the second leaf factor's output pre-transposed (einsum
# "...jn,nk->...kj"), fusing the final swapaxes into the matmul. Measured
# on-chip (tools/fft_ab.py, r2): LOSES 3-18% at 2^14..2^18 and is a wash
# at 2^20 — XLA's separate transpose pass beats Mosaic's transposed-output
# matmul layout here — so it is disabled by default and kept as a measured
# alternative (the A/B harness re-evaluates it per backend release).
_OUT_T_MIN_N2 = 1 << 30


def fft_split(x: Cplx, sign: int, impl: str = "auto",
              scale: float = 1.0) -> Cplx:
    """Unnormalized DFT over the last axis on a split (re, im) pair.

    ``scale`` returns scale * DFT(x) with the multiply fused into the
    transform (kernel epilogue on the vmem path, last-matmul epilogue on
    the XLA paths) — callers normalizing a large transform should pass
    it here instead of multiplying the result, which costs a full extra
    HBM pass when the pallas kernel carries the size.

    This is the jit-facing core. sign = -1: forward; +1: inverse (sum
    convention). Data dtype is preserved for float32/float64 inputs
    (everything else is cast to float32): the f64 path is the analog of
    the reference's -DUSE_DOUBLE MYFLT-width build flag
    (macos-build.sh:5) — twiddle/leaf tables are built in f64 and all
    arithmetic stays f64. It requires jax_enable_x64 (CPU; the TPU
    backend has no f64) — see utils.numerics.require_x64.
    """
    if impl not in _IMPLS:
        raise ValueError(f"unknown impl {impl!r}, expected one of {_IMPLS}")
    if sign not in (-1, 1):
        raise ValueError("sign must be -1 (forward) or +1 (inverse)")
    re = jnp.asarray(x[0])
    im = jnp.asarray(x[1])
    if re.dtype == jnp.float64 or im.dtype == jnp.float64:
        from ..utils.numerics import require_x64
        require_x64()
        re, im = re.astype(jnp.float64), im.astype(jnp.float64)
    else:
        re, im = re.astype(jnp.float32), im.astype(jnp.float32)
    if re.shape != im.shape:
        raise ValueError(f"re/im shapes differ: {re.shape} vs {im.shape}")
    n = re.shape[-1]
    if n < 1:
        raise ValueError("empty transform")
    if n == 1:
        return (re, im) if scale == 1.0 else (re * scale, im * scale)
    if not is_pow2(n):
        # beyond-parity: arbitrary sizes via Bluestein (power-of-two core)
        if impl == "vmem":
            # fail here with the user's n — the Bluestein core would
            # otherwise raise about the padded internal size instead
            raise ValueError(
                f"impl='vmem' needs a power-of-two size in the kernel "
                f"plan table, got {n}; use impl='auto'")
        if impl == "xla":
            return _fft_dispatch((re, im), sign, impl, scale)
        out = _fft_bluestein((re, im), sign, impl)
        if scale != 1.0:
            out = (out[0] * scale, out[1] * scale)
        return out
    return _fft_dispatch((re, im), sign, impl, scale)


def fft_unnormalized(x: jax.Array, sign: int, impl: str = "auto") -> jax.Array:
    """Complex-array convenience wrapper around fft_split (host boundary)."""
    re, im = fft_split(from_complex(x), sign, impl)
    return to_complex((re, im))


def cfft_split(x: Cplx, forward: bool = True, impl: str = "auto") -> Cplx:
    """Reference-convention FFT on split data (Clcfft::transform parity).

    forward=True  -> DFT(x) / N   (scaling fused in the last stage in the
                                   reference, cl_fft.cpp:39-40)
    forward=False -> unnormalized inverse DFT (sum convention)

    Roundtrip cfft(cfft(x, True), False) == x.
    """
    n = jnp.shape(x[0])[-1]
    # the 1/N rides in the transform epilogue (free on every path; an
    # outside divide costs an extra HBM pass on the vmem kernel path)
    return fft_split(x, -1 if forward else +1, impl,
                     scale=1.0 / n if forward else 1.0)


def cfft(x: jax.Array, forward: bool = True, impl: str = "auto") -> jax.Array:
    """Complex-array wrapper for cfft_split. Direction is a call argument
    rather than baked into the object (SURVEY quirk Q7); the parity classes
    in api.py restore the per-object direction surface."""
    return to_complex(cfft_split(from_complex(x), forward, impl))


def fft(x: jax.Array, impl: str = "auto") -> jax.Array:
    """Standard-convention forward DFT (no scaling)."""
    return fft_unnormalized(x, -1, impl)


def ifft(x: jax.Array, impl: str = "auto") -> jax.Array:
    """Standard-convention inverse DFT (scaled by 1/N)."""
    return fft_unnormalized(x, +1, impl) / x.shape[-1]
