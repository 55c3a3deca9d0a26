"""Pallas TPU kernel: fused frequency-delay-line complex MAC.

Replaces the dynamic_slice + multiply + reduce chain in
``ops/pconv._spectral_mac`` with a single fused VMEM pass: both spectral
rings live in VMEM, the ring window is a dynamic-start static-size row
slice of the DOUBLED input ring (see ``ops/pconv.PconvState``), and the
partition reduction happens in-register. No gather, no dynamic rotate —
both are slow or unsupported in Mosaic for this access pattern.

Semantics are identical to the reference ``convol`` kernel
(cl_conv_kernels.h:102-118): partition q pairs input frame (rp+q) % nparts
with coefficient frame q; bin 0 is the packed (DC, Nyq) pair and multiplies
componentwise; accumulation over partitions is a deterministic reduction
(the reference used float CAS atomics). ``b0_scale`` implements bin0_mode
(see ops/pconv.py).

VMEM budget: 6 planes of (nparts, bins) f32 ≈ 24 * cvs bytes — the caller
gates on ``fits_vmem`` and falls back to the XLA path for larger IRs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

# leave headroom below the ~16MB/core VMEM for twiddles & pipeline buffers
_VMEM_BUDGET = 10 * 1024 * 1024


def fits_vmem(nparts: int, bins: int) -> bool:
    # nparts must be sublane-aligned for the windowed DMA; tiny rings
    # aren't worth a kernel launch anyway
    if nparts < 8 or nparts % 8 or bins % 128:
        return False
    return 6 * nparts * bins * 4 <= _VMEM_BUDGET


def _mac_kernel(nparts, b0_scale, rp_ref, xr_ref, xi_ref, hr_ref, hi_ref,
                or_ref, oi_ref, xr_s, xi_s, sems):
    rp = rp_ref[0]
    # Doubled ring: rows [rp, rp+nparts) hold frames (rp+q) % nparts.
    # Mosaic requires 8-row (sublane) alignment for both vector loads and
    # DMA row offsets, and rp is arbitrary: DMA an ALIGNED window of
    # nparts+8 rows starting at 8*(rp//8), then fix the residual offset
    # o = rp % 8 with a static sublane rotate per switch branch.
    rp8 = pl.multiple_of((rp // 8) * 8, 8)
    cp_r = pltpu.make_async_copy(
        xr_ref.at[pl.ds(rp8, nparts + 8), :], xr_s, sems.at[0])
    cp_i = pltpu.make_async_copy(
        xi_ref.at[pl.ds(rp8, nparts + 8), :], xi_s, sems.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    hr = hr_ref[:]
    hi = hi_ref[:]
    col0 = jax.lax.broadcasted_iota(jnp.int32, hr.shape, 1) == 0

    def mac_at(o):
        # roll requires a non-negative shift: rolling UP by o == rolling
        # down by rows - o
        shift = (nparts + 8 - o) % (nparts + 8)

        def body():
            xr = pltpu.roll(xr_s[:], shift, 0)[:nparts]
            xi = pltpu.roll(xi_s[:], shift, 0)[:nparts]
            prod_r = xr * hr - xi * hi
            prod_i = xr * hi + xi * hr
            # bin 0: componentwise product of the packed (DC, Nyq) pair
            prod_r = jnp.where(col0, b0_scale * xr * hr, prod_r)
            prod_i = jnp.where(col0, b0_scale * xi * hi, prod_i)
            return (jnp.sum(prod_r, axis=0, keepdims=True),
                    jnp.sum(prod_i, axis=0, keepdims=True))
        return body

    acc_r, acc_i = jax.lax.switch(rp - rp8, [mac_at(o) for o in range(8)])
    or_ref[:] = acc_r
    oi_ref[:] = acc_i


def spectral_mac(x2: Cplx, h: Cplx, rp, b0_scale: float,
                 interpret: bool = False) -> Cplx:
    """acc[k] = sum_q x2[rp+q, k] (*) h[q, k]  — fused on TPU.

    x2: split DOUBLED ring (2*nparts, bins); h: split (nparts, bins);
    rp: int32 scalar in [0, nparts); returns a (bins,) split pair.
    """
    xr, xi = x2
    hr, hi = h
    nparts, bins = hr.shape
    rp = jnp.asarray(rp, jnp.int32).reshape(1)
    kern = functools.partial(_mac_kernel, nparts, float(b0_scale))
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
        interpret=interpret,
    )(rp, xr, xi, hr, hi)
    return out_r[0], out_i[0]
