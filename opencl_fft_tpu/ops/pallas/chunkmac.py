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


def _gb_vmem_est(nparts: int, bins: int, gb: int) -> int:
    # window (2 planes) + pre-shifted h scratch (2 * gb planes)
    return (2 + 2 * gb) * (nparts + gb) * bins * 4


def pick_group_blocks(nparts: int, bins: int) -> int:
    """Blocks per grid program. Pinned at 8: the MAC work per output
    block scales with (nparts + gb) and the shifted-h scratch DMA with
    gb^2, so larger groups LOSE despite amortizing per-program overhead
    (measured r3, nparts=256/bins=512, separate relay windows: gb=8
    1.2-3.2 us/block single-stream vs gb=32 2.8; serving-offline 64ch
    gb=8 never slower)."""
    gb = 8
    return gb if _gb_vmem_est(nparts, bins, gb) <= 56 * 1024 * 1024 else 0


def fits_vmem_chunkmac(nparts: int, bins: int) -> bool:
    if nparts < 8 or nparts % 8 or bins % 128:
        return False
    return pick_group_blocks(nparts, bins) > 0


def _chunkmac_kernel(nparts, b0_scale, gb, tr_ref, ti_ref, hr_ref, hi_ref,
                     or_ref, oi_ref, tr_s, ti_s, hr_s, hi_s, sems):
    """Per (channel, group) program: one aligned window DMA + eight
    roll-FREE masked MACs against the pre-shifted h copies.

    The first chunkmac design rotated the window 8 times per group
    (pltpu.roll of the full (nparts+8, bins) planes); Mosaic lowers
    those as VMEM copies that dominated the kernel (~45 us/group
    measured r3). The shifted-h formulation moves the 8 shifts to a
    HOST-side zero-padded stack built ONCE per call: window row u
    contributes to output j as win[u] * h[u - j], so h_shift[j] is h
    placed at row offset j with zero rows elsewhere — the MAC is then 8
    plain elementwise FMAs over the SAME unrotated window (the zero
    rows contribute nothing). h_shift is DMA'd into scratch once per
    CHANNEL (g == 0), not per group."""
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cp_hr = pltpu.make_async_copy(hr_ref.at[b], hr_s, sems.at[2])
        cp_hi = pltpu.make_async_copy(hi_ref.at[b], hi_s, sems.at[3])
        cp_hr.start()
        cp_hi.start()
        cp_hr.wait()
        cp_hi.wait()

    row0 = pl.multiple_of(g * gb, 8)
    cp_r = pltpu.make_async_copy(
        tr_ref.at[b, pl.ds(row0, nparts + gb), :], tr_s, sems.at[0])
    cp_i = pltpu.make_async_copy(
        ti_ref.at[b, pl.ds(row0, nparts + gb), :], ti_s, sems.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    xr = tr_s[:]
    xi = ti_s[:]
    col0 = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 1) == 0
    acc_r = []
    acc_i = []
    for j in range(gb):                     # static offsets within the group
        hr = hr_s[j]
        hi = hi_s[j]
        prod_r = xr * hr - xi * hi
        prod_i = xr * hi + xi * hr
        prod_r = jnp.where(col0, b0_scale * xr * hr, prod_r)
        prod_i = jnp.where(col0, b0_scale * xi * hi, prod_i)
        acc_r.append(jnp.sum(prod_r, axis=0, keepdims=True))
        acc_i.append(jnp.sum(prod_i, axis=0, keepdims=True))
    or_ref[0] = jnp.concatenate(acc_r, axis=0)
    oi_ref[0] = jnp.concatenate(acc_i, axis=0)


def _shift_h(h: jax.Array, gb: int) -> jax.Array:
    """(batch, nparts, bins) -> (batch, gb, nparts+gb, bins): copy j has
    h at row offset j, zero rows elsewhere (host/XLA-side, once per
    call)."""
    return jnp.stack(
        [jnp.pad(h, ((0, 0), (j, gb - j), (0, 0))) for j in range(gb)], axis=1)


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
    gb = pick_group_blocks(nparts, bins)
    if (rows - nparts) % gb:
        raise ValueError(
            f"timeline rows {rows} must be nparts + {gb}*G "
            f"(group_blocks({nparts}, {bins}) = {gb})")
    groups = (rows - nparts) // gb
    kern = functools.partial(_chunkmac_kernel, nparts, float(b0_scale), gb)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(batch, groups),
        out_shape=(
            jax.ShapeDtypeStruct((batch, gb * groups, bins), jnp.float32),
            jax.ShapeDtypeStruct((batch, gb * groups, bins), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # timeline stays off-VMEM
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),   # shifted h: DMA'd into
            pl.BlockSpec(memory_space=pltpu.ANY),   # scratch once per channel
        ],
        out_specs=(
            pl.BlockSpec((1, gb, bins), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb, bins), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nparts + gb, bins), jnp.float32),
            pltpu.VMEM((nparts + gb, bins), jnp.float32),
            pltpu.VMEM((gb, nparts + gb, bins), jnp.float32),
            pltpu.VMEM((gb, nparts + gb, bins), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(tr, ti, _shift_h(hr, gb), _shift_h(hi, gb))
    return out_r, out_i
