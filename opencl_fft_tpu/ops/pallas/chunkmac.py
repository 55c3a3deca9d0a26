"""Pallas TPU kernel: sliding-window spectral MAC over a frame timeline.

The frequency-delay-line MAC has NO sequential dependence once the
forward spectra are known: the ring at block t holds exactly the last
``nparts`` frame spectra, so

    acc[t] = sum_q  S[t - (nparts-1) + q] (*) h[q]

is a pure sliding-window complex correlation over the frame TIMELINE
(prior ring content + this call's batched-forward spectra). This kernel
computes K consecutive acc rows per call with the timeline in HBM/ANY
and only one (nparts+gb)-row window in VMEM per gb-block group — per-block
HBM traffic drops from the per-step path's ~4 ring planes + ~10MB of
constant tables to ~(nparts*bins)/gb bytes.

Semantics per row are identical to the reference ``convol`` kernel
(cl_conv_kernels.h:102-118): bin 0 is the packed (DC, Nyq) pair and
multiplies componentwise (b0_scale implements bin0_mode); accumulation
over partitions is a deterministic reduction.

Kernel evolution (all measured on-chip, r3):
  v1 rotated the window gb times per group with pltpu.roll — Mosaic
     lowers those as VMEM copies that dominated (~45 us/group).
  v2 moved the shifts into a host-built zero-padded h stack (window row
     u contributes to output j as win[u] * h[u - j], so h_shift[j] is h
     at row offset j, zero elsewhere) — plain FMAs, but the per-j
     cross-sublane jnp.sum reductions and bin-0 where-masks still ran
     on the VPU (~37 us/program fixed cost at nparts=256).
  v3 removes both: the bin-0 component-wise scaling is BAKED into the
     shifted stacks' column 0 (three stacks: hrA with col0 *= b0_scale
     for the real product, hiZ with col0 zeroed shared by both
     products, hrB with col0 = b0_scale * hi for the imag product — no
     masks in the loop), and the row reduction is ONE ones-vector
     dot_general per plane pair (the MXU contracts all gb output rows
     in a single pass; "reductions belong on the MXU"). Measured
     single-stream: 0.24 us/block (~45000x RT), at the HBM window-read
     bound — vs v2's 1.2-3.2.
  v4 (this file) moves the h stacks from manual g==0 scratch DMA to
     pipelined per-channel VMEM input blocks: pallas double-buffers the
     ~13MB fetch behind the previous channel's compute instead of
     stalling each channel's first group on it.

Mosaic constraints (CLAUDE.md landmines): window DMA row offsets are
gb*g (8-aligned); the leading CHANNEL grid dimension gives the
batched/serving regime a real kernel path — ``vmap`` over ANY-space
refs is rejected by Mosaic, an explicit grid dimension is not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Cplx

_VMEM_LIMIT = 100 * 1024 * 1024

# Largest channel count where the kernel beats a scan of the batched
# XLA step (interleaved A/B, r3, nparts=256/bins=512: 24x faster at
# batch=1, 4x at 4, +8% at 16, 1.6x SLOWER at 64 — the per-program
# window DMAs saturate HBM once many channels contend). Callers route
# larger batches to the streaming scan.
CHUNKMAC_MAX_BATCH = 16


def _gb_vmem_est(nparts: int, bins: int, gb: int) -> int:
    # window (2 planes) + 3 shifted-h stacks double-buffered by the
    # pallas pipeline (6*gb planes) + the two live (gb, rows, bins)
    # product values feeding the reduction dots
    return (2 + 8 * gb) * (nparts + gb) * bins * 4


def pick_group_blocks(nparts: int, bins: int) -> int:
    """Blocks per grid program. Pinned at 8: the MAC work per output
    block scales with (nparts + gb) and the shifted-h scratch DMA with
    gb^2, so larger groups LOSE despite amortizing per-program overhead
    (measured r3, nparts=256/bins=512, separate relay windows: gb=8
    1.2-3.2 us/block single-stream vs gb=32 2.8; serving-offline 64ch
    gb=8 never slower)."""
    gb = 8
    # budget: the raised 100MB scoped cap minus out-block double
    # buffers and headroom (keeps (512,512)/(256,1024) eligible, which
    # the kernel serves at ~67MB)
    return gb if _gb_vmem_est(nparts, bins, gb) <= 88 * 1024 * 1024 else 0


def fits_vmem_chunkmac(nparts: int, bins: int) -> bool:
    if nparts < 8 or nparts % 8 or bins % 128:
        return False
    return pick_group_blocks(nparts, bins) > 0


def _chunkmac_kernel(nparts, gb, tr_ref, ti_ref, hra_ref, hiz_ref, hrb_ref,
                     or_ref, oi_ref, tr_s, ti_s, sems):
    """Per (channel, group) program: one aligned window DMA, broadcast
    complex products against the pre-shifted h stacks, one MXU
    ones-contraction per output plane. The stacks arrive as PIPELINED
    VMEM blocks indexed on the channel only — pallas double-buffers
    the fetch behind the previous channel's compute and skips the
    re-fetch while the channel is unchanged (a manual scratch DMA at
    g == 0 serialized ~13MB per channel on the critical path)."""
    b = pl.program_id(0)
    g = pl.program_id(1)

    row0 = pl.multiple_of(g * gb, 8)
    cp_r = pltpu.make_async_copy(
        tr_ref.at[b, pl.ds(row0, nparts + gb), :], tr_s, sems.at[0])
    cp_i = pltpu.make_async_copy(
        ti_ref.at[b, pl.ds(row0, nparts + gb), :], ti_s, sems.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    xr = tr_s[:][None]                       # (1, rows, bins)
    xi = ti_s[:][None]
    # bin-0 componentwise semantics ride the stacks' column 0 (see
    # module docstring) — no masks here
    pr = xr * hra_ref[0] - xi * hiz_ref[0]   # (gb, rows, bins)
    pi = xr * hiz_ref[0] + xi * hrb_ref[0]
    rows = nparts + gb
    ones = jnp.ones((1, rows), jnp.float32)
    # HIGHEST: the MXU otherwise truncates the f32 products to bf16
    # (measured 1.6e-3 rel err vs the 2e-5 budget); the f32 pass costs
    # nothing at this size (rows x gb x bins MACs)
    or_ref[0] = jax.lax.dot_general(
        ones, pr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0]
    oi_ref[0] = jax.lax.dot_general(
        ones, pi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0]


def _shift_h(h: jax.Array, gb: int) -> jax.Array:
    """(batch, nparts, bins) -> (batch, gb, nparts+gb, bins): copy j has
    h at row offset j, zero rows elsewhere (host/XLA-side, once per
    call)."""
    return jnp.stack(
        [jnp.pad(h, ((0, 0), (j, gb - j), (0, 0))) for j in range(gb)], axis=1)


def _shift_stacks(hr: jax.Array, hi: jax.Array, b0_scale: float, gb: int):
    """The three shifted stacks with bin-0 componentwise scaling baked
    into column 0: prod_r = x_r*hrA - x_i*hiZ and prod_i = x_r*hiZ +
    x_i*hrB reproduce the masked complex MAC exactly (col0: hrA =
    b0*hr, hiZ = 0, hrB = b0*hi -> b0*xr*hr and b0*xi*hi)."""
    hra = jnp.concatenate([b0_scale * hr[..., :1], hr[..., 1:]], axis=-1)
    hiz = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., 1:]], axis=-1)
    hrb = jnp.concatenate([b0_scale * hi[..., :1], hr[..., 1:]], axis=-1)
    return _shift_h(hra, gb), _shift_h(hiz, gb), _shift_h(hrb, gb)


def chunk_mac(timeline: Cplx, h: Cplx, b0_scale: float,
              interpret: bool = False) -> Cplx:
    """acc[b, k] = sum_q timeline[b, k + q] (*) h[b, q], for k < gb*G.

    timeline: split (batch, nparts + gb*G, bins) — prior frames then fresh
    ones, zero-padded to the group grid (rows beyond nparts-1+K only feed
    discarded output rows); h: split (batch, nparts, bins) coefficient
    frames in ring order. Returns split (batch, gb*G, bins); the caller
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
    kern = functools.partial(_chunkmac_kernel, nparts, gb)
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
            # shifted h stacks: pipelined per-channel VMEM blocks
            pl.BlockSpec((1, gb, nparts + gb, bins),
                         lambda b, g: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb, nparts + gb, bins),
                         lambda b, g: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb, nparts + gb, bins),
                         lambda b, g: (b, 0, 0, 0), memory_space=pltpu.VMEM),
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
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(tr, ti, *_shift_stacks(hr, hi, float(b0_scale), gb))
    return out_r, out_i
