"""Pallas TPU kernel: sliding-window spectral MAC over a frame timeline.

The frequency-delay-line MAC has NO sequential dependence once the
forward spectra are known: the ring at block t holds exactly the last
``nparts`` frame spectra, so

    acc[t] = sum_q  S[t - (nparts-1) + q] (*) h[q]

is a pure sliding-window complex correlation over the frame TIMELINE
(prior ring content + this call's batched-forward spectra). This kernel
computes K consecutive acc rows per call with the timeline in HBM/ANY
and only one (nparts+8)-row window in VMEM per 8-block group — per-block
HBM traffic drops from the per-step path's ~4 ring planes + ~10MB of
constant tables to ~(nparts*bins)/8 bytes.

Semantics per row are identical to the reference ``convol`` kernel
(cl_conv_kernels.h:102-118): bin 0 is the packed (DC, Nyq) pair and
multiplies componentwise (b0_scale implements bin0_mode); accumulation
over partitions is a deterministic in-register reduction.

Mosaic constraints (CLAUDE.md landmines): window DMA row offsets are
8*g (aligned); the eight intra-group window starts come from static
sublane rotates of the one DMA'd window (roll shifts non-negative). The
leading CHANNEL grid dimension gives the batched/serving regime a real
kernel path — ``vmap`` over ANY-space refs is rejected by Mosaic, an
explicit grid dimension is not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

_VMEM_LIMIT = 100 * 1024 * 1024


def fits_vmem_chunkmac(nparts: int, bins: int) -> bool:
    """Window + rolled copies + per-channel h + margin under the raised
    scoped-vmem cap."""
    if nparts < 8 or nparts % 8 or bins % 128:
        return False
    est = (2 * (nparts + 8) + 4 * nparts + 2 * nparts) * bins * 4
    return est <= 60 * 1024 * 1024


def _chunkmac_kernel(nparts, b0_scale, tr_ref, ti_ref, hr_ref, hi_ref,
                     or_ref, oi_ref, tr_s, ti_s, sems):
    b = pl.program_id(0)
    g = pl.program_id(1)
    row0 = pl.multiple_of(g * 8, 8)
    cp_r = pltpu.make_async_copy(
        tr_ref.at[b, pl.ds(row0, nparts + 8), :], tr_s, sems.at[0])
    cp_i = pltpu.make_async_copy(
        ti_ref.at[b, pl.ds(row0, nparts + 8), :], ti_s, sems.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    hr = hr_ref[0]
    hi = hi_ref[0]
    col0 = jax.lax.broadcasted_iota(jnp.int32, hr.shape, 1) == 0
    rows = nparts + 8
    acc_r = []
    acc_i = []
    for j in range(8):                      # static offsets within the group
        shift = (rows - j) % rows
        xr = pltpu.roll(tr_s[:], shift, 0)[:nparts]
        xi = pltpu.roll(ti_s[:], shift, 0)[:nparts]
        prod_r = xr * hr - xi * hi
        prod_i = xr * hi + xi * hr
        prod_r = jnp.where(col0, b0_scale * xr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * xi * hi, prod_i)
        acc_r.append(jnp.sum(prod_r, axis=0, keepdims=True))
        acc_i.append(jnp.sum(prod_i, axis=0, keepdims=True))
    or_ref[0] = jnp.concatenate(acc_r, axis=0)
    oi_ref[0] = jnp.concatenate(acc_i, axis=0)


def chunk_mac(timeline: Cplx, h: Cplx, b0_scale: float,
              interpret: bool = False) -> Cplx:
    """acc[b, k] = sum_q timeline[b, k + q] (*) h[b, q], for k < 8*G.

    timeline: split (batch, nparts + 8*G, bins) — prior frames then fresh
    ones, zero-padded to the group grid (rows beyond nparts-1+K only feed
    discarded output rows); h: split (batch, nparts, bins) coefficient
    frames in ring order. Returns split (batch, 8*G, bins); the caller
    slices [:K].
    """
    tr, ti = timeline
    hr, hi = h
    batch, nparts, bins = hr.shape
    rows = tr.shape[1]
    if (rows - nparts) % 8:
        raise ValueError(f"timeline rows {rows} must be nparts + 8*G")
    groups = (rows - nparts) // 8
    kern = functools.partial(_chunkmac_kernel, nparts, float(b0_scale))
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(batch, groups),
        out_shape=(
            jax.ShapeDtypeStruct((batch, 8 * groups, bins), jnp.float32),
            jax.ShapeDtypeStruct((batch, 8 * groups, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # timeline stays off-VMEM
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, nparts, bins), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nparts, bins), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, bins), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bins), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.VMEM((nparts + 8, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(tr, ti, hr, hi)
    return out_r, out_i
