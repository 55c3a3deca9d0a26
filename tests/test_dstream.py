"""Whole-scan direct-FIR kernel (ops/pallas/dstream.py).

Pins the Toeplitz-slab construction and the kernel (interpret mode)
against the per-block XLA scan, including multi-block IRs (P > 1), both
delay alignments, continued state across chained calls, and the
remainder path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(11)


def test_toeplitz_slabs_match_step_contraction():
    """out_g[n] = sum_j [x_{g-P} .. x_g][j] * T[j, n] must equal the
    scan step's sliding-window matvec for both alignments."""
    from opencl_fft_tpu.ops import dconv as D
    from opencl_fft_tpu.ops.pallas.dstream import toeplitz_slabs

    for delay_compat in (False, True):
        irsize = vsize = 128
        cfg = D.DconvConfig(irsize=irsize, vsize=vsize,
                            delay_compat=delay_compat, pallas="off")
        ir = RNG.standard_normal(irsize).astype(np.float32)
        xprev = RNG.standard_normal(vsize).astype(np.float32)
        xcur = RNG.standard_normal(vsize).astype(np.float32)
        st = D.push_ir(cfg, D.dconv_init(cfg), ir)
        st, _ = D.dconv_step(cfg, st, xprev)
        _, ref = D.dconv_step(cfg, st, xcur)
        off = 0 if delay_compat else 1
        slabs = np.asarray(toeplitz_slabs(ir, irsize, vsize, off))
        d = np.concatenate([xprev, xcur])
        out = d @ slabs
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4, rtol=0)


@pytest.mark.parametrize("irsize,vsize", [(128, 128), (256, 128)])
@pytest.mark.parametrize("delay_compat", [False, True])
def test_dstream_kernel_matches_scan(irsize, vsize, delay_compat):
    from opencl_fft_tpu.ops import dconv as D

    cfg_k = D.DconvConfig(irsize=irsize, vsize=vsize,
                          delay_compat=delay_compat, pallas="stream")
    cfg_o = D.DconvConfig(irsize=irsize, vsize=vsize,
                          delay_compat=delay_compat, pallas="off")
    assert cfg_k._use_stream_kernel()
    ir = RNG.standard_normal(irsize).astype(np.float32) * 0.3
    nb = 19                                    # exercises the remainder
    blocks = jnp.asarray(RNG.standard_normal((2, nb, vsize)), jnp.float32)
    st_k = D.push_ir(cfg_k, D.dconv_init(cfg_k), ir)
    st_o = D.push_ir(cfg_o, D.dconv_init(cfg_o), ir)
    st_k, o_k1 = D.dconv_stream(cfg_k, st_k, blocks[0])
    st_o, o_o1 = D.dconv_stream(cfg_o, st_o, blocks[0])
    st_k, o_k2 = D.dconv_stream(cfg_k, st_k, blocks[1])
    st_o, o_o2 = D.dconv_stream(cfg_o, st_o, blocks[1])
    scale = float(jnp.abs(o_o1).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o_k1), np.asarray(o_o1),
                               atol=3e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(o_k2), np.asarray(o_o2),
                               atol=3e-5 * scale, rtol=0)
    assert int(st_k.wp) == int(st_o.wp)
    np.testing.assert_allclose(np.asarray(st_k.delay),
                               np.asarray(st_o.delay),
                               atol=1e-6 * scale, rtol=0)
    np.testing.assert_array_equal(np.asarray(st_k.coefs),
                                  np.asarray(st_o.coefs))


def test_dstream_gate():
    from opencl_fft_tpu.ops import dconv as D
    from opencl_fft_tpu.ops.pallas.dstream import fits_dstream

    assert fits_dstream(512, 512)
    assert fits_dstream(1024, 512)
    assert not fits_dstream(512, 100)          # lane misalignment
    assert not fits_dstream(500, 128)          # not a block multiple
    assert not fits_dstream(8 * 128, 128)      # P beyond the carry cap
    # f64 and explicit off stay on the scan
    assert not D.DconvConfig(irsize=512, vsize=512, dtype="f64",
                             pallas="stream")._use_stream_kernel()
    assert not D.DconvConfig(irsize=512, vsize=512,
                             pallas="off")._use_stream_kernel()


def test_dstream_bitwise_rerun():
    from opencl_fft_tpu.ops import dconv as D

    cfg = D.DconvConfig(irsize=128, vsize=128, pallas="stream")
    ir = RNG.standard_normal(128).astype(np.float32)
    blocks = jnp.asarray(RNG.standard_normal((16, 128)), jnp.float32)
    st = D.push_ir(cfg, D.dconv_init(cfg), ir)
    _, o1 = D.dconv_stream(cfg, st, blocks)
    _, o2 = D.dconv_stream(cfg, st, blocks)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
