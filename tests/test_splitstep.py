"""Half-table stream kernel (ops/pallas/splitstep.py).

Pins (a) the table factorization against the dense wfwd/wpost products
it replaces, and (b) the whole-scan kernels (interpret mode) against the
per-block XLA scan, LTI and TV, including continued state across chained
calls. The factored kernel exists for shapes whose dense tables bust
VMEM (bins = 2048 — the M=2048 benchmark row); correctness is
shape-independent so the tests run at small sizes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("m", [16, 64, 256])
def test_factored_forward_matches_dense(m):
    from opencl_fft_tpu.ops.pallas import splitstep as S
    from opencl_fft_tpu.ops.pallas.blockstep import _wfwd_np

    x = RNG.standard_normal((3, m)).astype(np.float32)
    ref = x @ _wfwd_np(m)
    re, im = S.fwd_ref(x, m)
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(re), ref[:, :m],
                               atol=1e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(im), ref[:, m:],
                               atol=1e-5 * scale, rtol=0)


@pytest.mark.parametrize("m", [16, 64, 256])
def test_factored_inverse_matches_dense(m):
    from opencl_fft_tpu.ops.pallas import splitstep as S
    from opencl_fft_tpu.ops.pallas.blockstep import _wpost_np

    acc = RNG.standard_normal((3, 2 * m)).astype(np.float32)
    ref = acc @ _wpost_np(m)
    o1, o2 = S.inv_ref(acc[:, :m], acc[:, m:], m)
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(o1), ref[:, :m],
                               atol=1e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(o2), ref[:, m:],
                               atol=1e-5 * scale, rtol=0)


def test_coef_extraction_rejects_nonsparse():
    from opencl_fft_tpu.ops.pallas.splitstep import _diag_flip_coeffs

    with pytest.raises(ValueError):
        _diag_flip_coeffs(np.ones((8, 8)))


def test_split_gate():
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.pallas.splitstep import (
        fits_vmem_splitstep, fits_vmem_splitstep_tv)
    from opencl_fft_tpu.ops.pallas.streamstep import fits_vmem_streamstep

    # the split kernel's reason to exist: bins=2048 fits it, not classic
    assert fits_vmem_splitstep(512, 2048)
    assert not fits_vmem_streamstep(512, 2048)
    # measured compile envelope (tools/vmem_probe.py): (1024, 2048)
    # compiles, (2048, 2048) fails; the TV kernel (h ring resident too)
    # is one doubling tighter
    assert fits_vmem_splitstep(1024, 2048)
    assert not fits_vmem_splitstep(2048, 2048)
    assert fits_vmem_splitstep_tv(512, 2048)
    assert not fits_vmem_splitstep_tv(1024, 2048)
    # dispatch: "stream" falls through to split where classic can't fit
    cfg = P.PconvConfig(pts=2048, nparts=128, pallas="stream")
    assert cfg._stream_kernel_impl() == "split"
    assert cfg._stream_kernel_impl(tv=True) == "split"
    # explicit opt-in and the classic-preferred ordering
    assert P.PconvConfig(pts=512, nparts=256,
                         pallas="stream")._stream_kernel_impl() == "classic"
    assert P.PconvConfig(pts=512, nparts=256,
                         pallas="split")._stream_kernel_impl() == "split"


@pytest.mark.parametrize("bin0_mode", ["exact", "compat"])
def test_split_kernel_matches_scan(bin0_mode):
    """pallas='split' whole-scan kernel == per-block scan: outputs and
    continued state across chained calls (ring <-> window round-trip)."""
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb = 128, 8, 20
    cfg_s = P.PconvConfig(pts=pts, nparts=nparts, pallas="split",
                          bin0_mode=bin0_mode)
    cfg_o = P.PconvConfig(pts=pts, nparts=nparts, pallas="off",
                          bin0_mode=bin0_mode)
    assert cfg_s._stream_kernel_impl() == "split"
    ir = RNG.standard_normal(pts * nparts).astype(np.float32) * 0.2
    blocks = jnp.asarray(RNG.standard_normal((2, nb, pts)), jnp.float32)
    st_s = P.push_ir(cfg_s, P.pconv_init(cfg_s), ir)
    st_o = P.push_ir(cfg_o, P.pconv_init(cfg_o), ir)
    st_s, o_s1 = P.pconv_stream(cfg_s, st_s, blocks[0])
    st_o, o_o1 = P.pconv_stream(cfg_o, st_o, blocks[0])
    st_s, o_s2 = P.pconv_stream(cfg_s, st_s, blocks[1])
    st_o, o_o2 = P.pconv_stream(cfg_o, st_o, blocks[1])
    scale = float(jnp.abs(o_o1).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o_s1), np.asarray(o_o1),
                               atol=3e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(o_s2), np.asarray(o_o2),
                               atol=3e-5 * scale, rtol=0)
    assert int(st_s.wp) == int(st_o.wp)
    rs = float(jnp.abs(st_o.spec_x_re).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(st_s.spec_x_re),
                               np.asarray(st_o.spec_x_re),
                               atol=3e-5 * rs, rtol=0)
    np.testing.assert_allclose(np.asarray(st_s.spec_x_im),
                               np.asarray(st_o.spec_x_im),
                               atol=3e-5 * rs, rtol=0)


def test_split_tv_kernel_matches_scan():
    """TV variant: in-kernel h updates at decrementing wp2 + the
    sub-group remainder path match the per-block TV scan."""
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb = 128, 8, 19        # non-multiple of 8: remainder path
    cfg_s = P.PconvConfig(pts=pts, nparts=nparts, pallas="split")
    cfg_o = P.PconvConfig(pts=pts, nparts=nparts, pallas="off")
    ir = RNG.standard_normal(pts * nparts).astype(np.float32) * 0.2
    bx = jnp.asarray(RNG.standard_normal((nb, pts)), jnp.float32)
    bh = jnp.asarray(RNG.standard_normal((nb, pts)) * 0.1, jnp.float32)
    st_s = P.push_ir(cfg_s, P.pconv_init(cfg_s), ir)
    st_o = P.push_ir(cfg_o, P.pconv_init(cfg_o), ir)
    st_s, o_s = P.pconv_stream_tv(cfg_s, st_s, bx, bh)
    st_o, o_o = P.pconv_stream_tv(cfg_o, st_o, bx, bh)
    scale = float(jnp.abs(o_o).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_o),
                               atol=3e-5 * scale, rtol=0)
    assert int(st_s.wp2) == int(st_o.wp2)
    hs = float(jnp.abs(st_o.spec_h_re).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(st_s.spec_h_re),
                               np.asarray(st_o.spec_h_re),
                               atol=3e-5 * hs, rtol=0)


def test_split_kernel_bitwise_rerun():
    """Deterministic: identical inputs -> bit-identical outputs."""
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb = 128, 16, 16
    cfg = P.PconvConfig(pts=pts, nparts=nparts, pallas="split")
    ir = RNG.standard_normal(pts * nparts).astype(np.float32) * 0.2
    blocks = jnp.asarray(RNG.standard_normal((nb, pts)), jnp.float32)
    st = P.push_ir(cfg, P.pconv_init(cfg), ir)
    _, o1 = P.pconv_stream(cfg, st, blocks)
    _, o2 = P.pconv_stream(cfg, st, blocks)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
