"""Whole-scan grid kernel for the direct FIR engine (Cldconv analog).

The XLA dconv step costs ~8-9 us/block on this backend, nearly all of it
per-iteration scan overhead: the actual math at irsize = vsize = 512 is
half a MFLOP. With irsize an exact multiple of vsize, each output block
is a BLOCK-ToEPLITZ product of the last P+1 = irsize/vsize + 1 input
blocks against constant (vsize, vsize) slabs built once per scan from
the coefficients:

    out_g = sum_p x_{g-P+p} @ T_p,   T stacked as ((P+1)*vsize, vsize)

so the whole stream runs as one launch: T resident in VMEM, a (P, vsize)
carry of previous blocks in scratch, P+1 small MXU matmuls per grid step
of G=8 blocks. Per-block HBM traffic is the block in/out only.

Replaces the per-(tap x sample) thread grid + CAS float atomics of
/root/reference/cl_dconv.cpp:17-43 with deterministic matmuls; the ring
state round-trips outside the kernel (ops/dconv.dconv_stream), so the
per-block scan path and this kernel are interchangeable mid-stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024
_STEP_GROUP = 8
_MAX_P = 7          # carry rows; P+1 context blocks must fit one group


def fits_dstream(irsize: int, vsize: int) -> bool:
    """Kernel eligibility: lane-aligned blocks, block-multiple IR, the
    carry within one step group, tables comfortably in VMEM."""
    if vsize % 128 or irsize % vsize:
        return False
    p = irsize // vsize
    if not 1 <= p <= _MAX_P:
        return False
    tables = (p + 1) * vsize * vsize * 4
    return tables <= 40 * 1024 * 1024


def toeplitz_slabs(coefs, irsize: int, vsize: int, off: int):
    """((P+1)*vsize, vsize) stacked Toeplitz slabs from the coefficient
    vector: T[j, n] = k[j - off - n] with k the TIME-REVERSED IR
    (k[h] = ir[irsize-1-h], zero outside [0, irsize)), so that
    d = [x_{g-P} .. x_g] gives out_g[n] = sum_j d[j] T[j, n] — the exact
    contraction dconv_step's sliding-window matvec computes
    (out[n] = sum_h d[n+off+h] k[h]). Built in XLA once per scan (the
    gather is off the hot path)."""
    ir = jnp.asarray(coefs)[:irsize]
    ring = irsize + vsize
    j = jax.lax.broadcasted_iota(jnp.int32, (ring, vsize), 0)
    n = jax.lax.broadcasted_iota(jnp.int32, (ring, vsize), 1)
    h = j - off - n
    valid = (h >= 0) & (h < irsize)
    t = jnp.take(ir, jnp.clip(irsize - 1 - h, 0, irsize - 1), axis=0)
    return jnp.where(valid, t, 0.0).astype(ir.dtype)


def _dstream_kernel(p, vsize, blk_ref, t_ref, carry0_ref, out_ref, c_s):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        c_s[:] = carry0_ref[:]

    hp = jax.lax.Precision.HIGHEST
    x = blk_ref[:]                                     # (G, v)
    xfull = jnp.concatenate([c_s[:], x], axis=0)       # (P+G, v)
    g = _STEP_GROUP
    out = jax.lax.dot(xfull[0:g], t_ref[0:vsize], precision=hp)
    for q in range(1, p + 1):
        out += jax.lax.dot(xfull[q:q + g],
                           t_ref[q * vsize:(q + 1) * vsize], precision=hp)
    out_ref[:] = out
    c_s[:] = xfull[g:]                                 # last P rows


def dstream_steps(blocks, carry0, slabs, vsize: int,
                  interpret: bool = False):
    """Run an entire LTI direct-FIR scan in one launch.

    blocks: (nblocks, vsize), nblocks a multiple of _STEP_GROUP;
    carry0: (P, vsize) — the previous P blocks, oldest first; slabs:
    toeplitz_slabs output. Returns outs (nblocks, vsize). Final ring
    state is reconstructed by the caller from the input blocks."""
    nblocks = blocks.shape[0]
    if nblocks % _STEP_GROUP:
        raise ValueError(
            f"nblocks must be a multiple of {_STEP_GROUP}, got {nblocks} "
            f"(the dconv_stream wrapper handles remainders)")
    p = carry0.shape[0]
    kern = functools.partial(_dstream_kernel, int(p), int(vsize))
    const = lambda j: (0, 0)
    outs = pl.pallas_call(
        kern,
        grid=(nblocks // _STEP_GROUP,),
        out_shape=jax.ShapeDtypeStruct((nblocks, vsize), jnp.float32),
        in_specs=[
            pl.BlockSpec((_STEP_GROUP, vsize), lambda j: (j, 0)),
            pl.BlockSpec(((p + 1) * vsize, vsize), const),
            pl.BlockSpec((p, vsize), const),
        ],
        out_specs=pl.BlockSpec((_STEP_GROUP, vsize), lambda j: (j, 0)),
        scratch_shapes=[pltpu.VMEM((p, vsize), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(blocks, jnp.float32), jnp.asarray(slabs, jnp.float32),
      jnp.asarray(carry0, jnp.float32))
    return outs
