"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencl_fft_tpu.ops.pallas.mac import fits_vmem, spectral_mac

RNG = np.random.default_rng(55)


def _xla_mac(x, h, rp, b0):
    xr, xi = x
    hr, hi = h
    np_ = xr.shape[0]
    idx = (rp + np.arange(np_)) % np_
    gxr, gxi = xr[idx], xi[idx]
    acc_r = np.sum(gxr * hr - gxi * hi, axis=0)
    acc_i = np.sum(gxr * hi + gxi * hr, axis=0)
    acc_r[0] = b0 * np.sum(gxr[:, 0] * hr[:, 0])
    acc_i[0] = b0 * np.sum(gxi[:, 0] * hi[:, 0])
    return acc_r, acc_i


@pytest.mark.parametrize("nparts,bins", [(8, 128), (16, 256), (32, 512)])
@pytest.mark.parametrize("rp", [0, 1, 3, 7, 9])
@pytest.mark.parametrize("b0", [1.0, 2.0])
def test_mac_kernel_matches_xla(nparts, bins, rp, b0):
    x = tuple(RNG.standard_normal((nparts, bins)).astype(np.float32)
              for _ in range(2))
    h = tuple(RNG.standard_normal((nparts, bins)).astype(np.float32)
              for _ in range(2))
    rp = rp % nparts
    x2 = tuple(np.concatenate([p, p], axis=0) for p in x)   # doubled ring
    got_r, got_i = spectral_mac(
        tuple(map(jnp.asarray, x2)), tuple(map(jnp.asarray, h)),
        rp, b0, interpret=True)
    exp_r, exp_i = _xla_mac(tuple(map(np.array, x)), tuple(map(np.array, h)),
                            rp, b0)
    np.testing.assert_allclose(np.asarray(got_r), exp_r, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), exp_i, atol=1e-4)


def test_fits_vmem_gate():
    assert fits_vmem(256, 512)
    assert not fits_vmem(2048, 1024)


def test_pconv_uses_pallas_only_when_sized():
    from opencl_fft_tpu.ops.pconv import PconvConfig
    small = PconvConfig.for_ir_length(1 << 17, 512, pallas="on")
    assert small._use_pallas_mac()
    big = PconvConfig.for_ir_length(1 << 22, 512, pallas="on")
    assert not big._use_pallas_mac()          # exceeds VMEM budget
    off = PconvConfig.for_ir_length(1 << 17, 512, pallas="off")
    assert not off._use_pallas_mac()


@pytest.mark.parametrize("nparts,bins", [(8, 128), (16, 256), (32, 512)])
@pytest.mark.parametrize("rp", [0, 3, 7])
def test_blockstep_kernel_matches_mac_plus_unpack(nparts, bins, rp):
    """Fused block-step (MAC + bin0 + inverse pre-process) == the XLA
    reference chain _spectral_mac -> rfft.unpack_inverse."""
    from opencl_fft_tpu.ops.pallas.blockstep import block_mac_unpack
    from opencl_fft_tpu.ops.rfft import unpack_inverse

    x = tuple(RNG.standard_normal((nparts, bins)).astype(np.float32)
              for _ in range(2))
    h = tuple(RNG.standard_normal((nparts, bins)).astype(np.float32)
              for _ in range(2))
    rp = rp % nparts
    x2 = tuple(np.concatenate([p, p], axis=0) for p in x)
    got_r, got_i = block_mac_unpack(
        tuple(map(jnp.asarray, x2)), tuple(map(jnp.asarray, h)),
        rp, 2.0, interpret=True)
    acc = _xla_mac(tuple(map(np.array, x)), tuple(map(np.array, h)), rp, 2.0)
    exp_r, exp_i = unpack_inverse(tuple(map(jnp.asarray, acc)))
    scale = np.max(np.abs(np.asarray(exp_r))) + 1e-9
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(exp_r),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(exp_i),
                               atol=1e-4 * scale)


def test_blockstep_vmem_gate():
    from opencl_fft_tpu.ops.pallas.blockstep import fits_vmem_blockstep
    assert fits_vmem_blockstep(256, 512)
    assert not fits_vmem_blockstep(256, 2048)   # tables too large
    assert not fits_vmem_blockstep(12, 128)     # sublane misaligned


@pytest.mark.parametrize("nparts,bins,rp", [(8, 128, 0), (16, 256, 5)])
def test_blockstep_full_matches_xla_step_chain(nparts, bins, rp):
    """Fused FULL block step (MAC + unpack + inverse DFT + deinterleave
    + OLA) == the XLA chain _spectral_mac -> unpack -> ifft -> interleave
    -> overlap-add."""
    from opencl_fft_tpu.ops.fft import exact_precision, fft_split
    from opencl_fft_tpu.ops.pallas.blockstep import block_step_fused
    from opencl_fft_tpu.ops.rfft import interleave, unpack_inverse

    pts = bins
    x = tuple(RNG.standard_normal((nparts, bins)).astype(np.float32)
              for _ in range(2))
    h = tuple(RNG.standard_normal((nparts, bins)).astype(np.float32)
              for _ in range(2))
    tail = RNG.standard_normal(bins).astype(np.float32)
    x2 = tuple(np.concatenate([p, p], axis=0) for p in x)
    out, new_tail = block_step_fused(
        tuple(map(jnp.asarray, x2)), tuple(map(jnp.asarray, h)), rp, 2.0,
        jnp.asarray(tail), pts, interpret=True)

    acc = _xla_mac(tuple(map(np.array, x)), tuple(map(np.array, h)), rp, 2.0)
    z = unpack_inverse(tuple(map(jnp.asarray, acc)))
    with exact_precision():
        y = interleave(fft_split(z, +1))
    exp_out = (np.asarray(y)[:pts] + tail) / pts
    exp_tail = np.asarray(y)[pts:]
    scale = np.max(np.abs(exp_tail)) + 1e-9
    np.testing.assert_allclose(np.asarray(out), exp_out,
                               atol=1e-4 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(new_tail), exp_tail,
                               atol=1e-4 * scale, rtol=0)


@pytest.mark.parametrize("tv", [False, True])
def test_blockstep_fwd_fused_streaming_matches_xla(tv):
    """The FULLY fused step (forward rFFT inside the kernel, pallas=
    'blockf') streams to the same output as the XLA step chain within
    f32 tolerance (the in-kernel forward is a direct DFT matmul; the XLA
    path factorizes, so rounding differs at ~1e-6 relative)."""
    import jax
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nblocks = 128, 8, 20
    kw = dict(bin0_mode="exact")
    cfg_off = P.PconvConfig(pts=pts, nparts=nparts, pallas="off", **kw)
    cfg_f = P.PconvConfig(pts=pts, nparts=nparts, pallas="blockf", **kw)
    assert cfg_f._use_pallas_blockstep_fwd()
    blocks = RNG.standard_normal((nblocks, pts)).astype(np.float32)
    if tv:
        coefs = RNG.standard_normal((nblocks, pts)).astype(np.float32) * 0.3
        outs = {}
        for cfg in (cfg_off, cfg_f):
            st = P.pconv_init(cfg)
            got = []
            for bx, bh in zip(blocks, coefs):
                st, o = P.pconv_step_tv(cfg, st, bx, bh)
                got.append(np.asarray(o))
            outs[cfg.pallas] = np.concatenate(got)
    else:
        ir = RNG.standard_normal(pts * nparts).astype(np.float32) * 0.2
        outs = {}
        for cfg in (cfg_off, cfg_f):
            st = P.push_ir(cfg, P.pconv_init(cfg), ir)
            got = []
            for b in blocks:
                st, o = P.pconv_step(cfg, st, b)
                got.append(np.asarray(o))
            outs[cfg.pallas] = np.concatenate(got)
    scale = np.max(np.abs(outs["off"])) + 1e-9
    np.testing.assert_allclose(outs["blockf"], outs["off"],
                               atol=2e-5 * scale, rtol=0)


def test_fwd_dft_matrix_matches_forward_partition():
    """block @ F == the unnormalized forward half-size FFT of the
    zero-padded frame (the XLA _forward_partition output, pre-pack)."""
    from opencl_fft_tpu.ops.fft import exact_precision, fft_split
    from opencl_fft_tpu.ops.pallas.blockstep import _fwd_dft_np
    from opencl_fft_tpu.ops.rfft import deinterleave

    pts = 128
    block = RNG.standard_normal(pts).astype(np.float32)
    frame = np.concatenate([block, np.zeros(pts, np.float32)])
    z = deinterleave(jnp.asarray(frame))
    with exact_precision():
        er, ei = fft_split(z, -1)
    got = block[None] @ _fwd_dft_np(pts)
    np.testing.assert_allclose(got[0, :pts], np.asarray(er), atol=1e-3)
    np.testing.assert_allclose(got[0, pts:], np.asarray(ei), atol=1e-3)


# ---------------------------------------------------------------------------
# Sliding-window chunk MAC (ops/pallas/chunkmac.py) + offline engine
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("batch", [1, 3])
@pytest.mark.parametrize("nparts,bins,k", [(8, 128, 8), (16, 128, 20)])
def test_chunkmac_matches_sliding_window(batch, nparts, bins, k):
    from opencl_fft_tpu.ops.pallas.chunkmac import (chunk_mac,
                                                    pick_group_blocks)

    gb = pick_group_blocks(nparts, bins)
    groups = -(-k // gb)
    rows = nparts + gb * groups
    real = nparts - 1 + k
    tl = RNG.standard_normal((2, batch, rows, bins)).astype(np.float32)
    tl[:, :, real:] = 0.0
    h = RNG.standard_normal((2, batch, nparts, bins)).astype(np.float32)
    got_r, got_i = chunk_mac((jnp.asarray(tl[0]), jnp.asarray(tl[1])),
                             (jnp.asarray(h[0]), jnp.asarray(h[1])),
                             2.0, interpret=True)
    for b in range(batch):
        for kk in range(k):
            xr = tl[0, b, kk:kk + nparts]
            xi = tl[1, b, kk:kk + nparts]
            hr, hi = h[0, b], h[1, b]
            er = np.sum(xr * hr - xi * hi, axis=0)
            ei = np.sum(xr * hi + xi * hr, axis=0)
            er[0] = 2.0 * np.sum(xr[:, 0] * hr[:, 0])
            ei[0] = 2.0 * np.sum(xi[:, 0] * hi[:, 0])
            np.testing.assert_allclose(np.asarray(got_r)[b, kk], er, atol=1e-4)
            np.testing.assert_allclose(np.asarray(got_i)[b, kk], ei, atol=1e-4)


@pytest.mark.parametrize("nblocks", [4, 8, 20])
def test_pconv_offline_matches_streaming(nblocks):
    """pconv_offline (no sequential scan) == pconv_step streaming, for
    nblocks below, equal to, and beyond nparts."""
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts = 128, 16
    cfg = P.PconvConfig(pts=pts, nparts=nparts, pallas="on")
    assert P._use_chunkmac(cfg)
    ir = RNG.standard_normal(pts * nparts).astype(np.float32) * 0.2
    blocks = RNG.standard_normal((nblocks, pts)).astype(np.float32)
    st0 = P.push_ir(cfg, P.pconv_init(cfg), ir)
    # prime with a couple of streamed blocks so wp != 0 and tail != 0
    pre = RNG.standard_normal((3, pts)).astype(np.float32)
    st = st0
    for b in pre:
        st, _ = P.pconv_step(cfg, st, b)

    st_seq = st
    outs_seq = []
    for b in blocks:
        st_seq, o = P.pconv_step(cfg, st_seq, b)
        outs_seq.append(np.asarray(o))
    outs_seq = np.stack(outs_seq)

    st_off, outs_off = P.pconv_offline(cfg, st, blocks)
    scale = np.max(np.abs(outs_seq)) + 1e-9
    np.testing.assert_allclose(np.asarray(outs_off), outs_seq,
                               atol=2e-5 * scale, rtol=0)
    # final state must agree too (ring content, pointer, tail); the tail
    # and ring are UNNORMALIZED (pre-/pts), so they get their own scales
    assert int(st_off.wp) == int(st_seq.wp)
    tscale = np.max(np.abs(np.asarray(st_seq.tail))) + 1e-9
    np.testing.assert_allclose(np.asarray(st_off.tail),
                               np.asarray(st_seq.tail), atol=2e-5 * tscale)
    rscale = np.max(np.abs(np.asarray(st_seq.spec_x_re))) + 1e-9
    np.testing.assert_allclose(np.asarray(st_off.spec_x_re),
                               np.asarray(st_seq.spec_x_re),
                               atol=2e-5 * rscale)
    # streaming continues correctly from the offline-produced state
    nxt = RNG.standard_normal(pts).astype(np.float32)
    _, o_seq = P.pconv_step(cfg, st_seq, nxt)
    _, o_off = P.pconv_step(cfg, st_off, nxt)
    np.testing.assert_allclose(np.asarray(o_off), np.asarray(o_seq),
                               atol=2e-5 * scale)


# ---------------------------------------------------------------------------
# Whole-transform VMEM-resident FFT (ops/pallas/vmemfft.py)
# ---------------------------------------------------------------------------

from opencl_fft_tpu.ops.pallas.vmemfft import fft_vmem, supported  # noqa: E402


@pytest.mark.parametrize("n", [1 << 13, 1 << 14, 1 << 16])
@pytest.mark.parametrize("sign", [-1, 1])
def test_vmemfft_matches_numpy(n, sign):
    assert supported(n)
    x = (RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n)))
    re, im = fft_vmem((jnp.asarray(x.real, jnp.float32),
                       jnp.asarray(x.imag, jnp.float32)), sign,
                      interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(x) if sign == -1 else np.fft.ifft(x) * n
    scale = np.max(np.abs(ref))
    # bf16x3 over three matmul levels: ~5e-5 relative budget
    np.testing.assert_allclose(got, ref, atol=1e-4 * scale, rtol=0)


@pytest.mark.parametrize("n", [1 << 13, 1 << 16])
def test_vmemfft_transposed_l2_bit_identical(n):
    """levels=5 (explicit in-VMEM digit transpose, single wide L2 dot)
    must be BIT-identical to the production 3-level kernel: same dots,
    same rounding — only the free-dim structure of L2 changes."""
    x = (RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n)))
    sp = (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    s = 1.0 / np.sqrt(n)
    pr, pi = fft_vmem(sp, -1, interpret=True, levels=3, scale=s)
    tr, ti = fft_vmem(sp, -1, interpret=True, levels=5, scale=s)
    assert np.array_equal(np.asarray(pr), np.asarray(tr))
    assert np.array_equal(np.asarray(pi), np.asarray(ti))


def test_vmemfft_roundtrip_and_determinism():
    n = 1 << 14
    x = (RNG.standard_normal((3, n)) + 1j * RNG.standard_normal((3, n)))
    sp = (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    fr, fi = fft_vmem(sp, -1, interpret=True)
    br, bi = fft_vmem((fr / n, fi / n), +1, interpret=True)
    np.testing.assert_allclose(np.asarray(br), x.real, atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(bi), x.imag, atol=2e-4, rtol=0)
    r2, i2 = fft_vmem(sp, -1, interpret=True)
    assert np.array_equal(np.asarray(fr), np.asarray(r2))
    assert np.array_equal(np.asarray(fi), np.asarray(i2))


def test_vmemfft_three_factor_plan_override_defaults_tb():
    """A 3-tuple plan_override (no tb) is legal at the public surface:
    tb defaults from the tuned plan instead of crashing in _build."""
    n = 1 << 14
    x = RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n))
    sp = (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    re, im = fft_vmem(sp, -1, interpret=True, levels=3,
                      plan_override=(32, 32, 16))
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(x)
    np.testing.assert_allclose(got, ref, atol=1e-4 * np.max(np.abs(ref)),
                               rtol=0)
    with pytest.raises(ValueError):          # wrong factor product
        fft_vmem(sp, -1, interpret=True, levels=3,
                 plan_override=(32, 32, 8))
    with pytest.raises(ValueError):          # ignored-by-path is an error
        fft_vmem(sp, -1, interpret=True, levels=2,
                 plan_override=(32, 32, 16))


@pytest.mark.parametrize("n,plan,mask", [
    (1 << 15, (16, 8, 256), 0),       # plan override, block both levels
    (1 << 15, (16, 8, 256), 3),       # Gauss on both kernel levels
    (1 << 18, None, 0),               # default _PLANS_F2 entry
])
@pytest.mark.parametrize("sign", [-1, 1])
def test_vmemfft_front2_matches_numpy(n, plan, mask, sign):
    """Front-2 hybrid (levels=8): L1+L2 kernel gridded over rows x
    f3-chunks + one XLA f3-leaf pass must match numpy within the same
    bf16x3 budget as the whole-transform kernels."""
    from opencl_fft_tpu.ops.pallas.vmemfft import fft_vmem_front2
    x = (RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n)))
    s = 1.0 / np.sqrt(n)
    re, im = fft_vmem_front2(
        (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32)),
        sign, interpret=True, plan_override=plan, gauss_mask=mask, scale=s)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = (np.fft.fft(x) if sign == -1 else np.fft.ifft(x) * n) * s
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=1e-4 * scale, rtol=0)


@pytest.mark.parametrize("n", [1 << 10, 1 << 11, 1 << 12, 1 << 13])
@pytest.mark.parametrize("sign", [-1, 1])
def test_vmemfft_sublane_matches_numpy(n, sign):
    """Sublane-DFT two-level kernel (levels=9, VERDICT r4 #2): the VPU
    f1-level is exact f32 and the lane leaf bf16x3, so the budget is the
    same ~5e-5 relative as the other kernels. Both output modes
    (in-kernel digit transpose / XLA transpose pass) must agree with
    numpy; a scale must fold into the twiddle table exactly."""
    from opencl_fft_tpu.ops.pallas.vmemfft import _PLANS_SL
    assert n in _PLANS_SL and supported(n)
    x = (RNG.standard_normal((4, n)) + 1j * RNG.standard_normal((4, n)))
    sp = (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    s = 1.0 / np.sqrt(n)
    ref = (np.fft.fft(x) if sign == -1 else np.fft.ifft(x) * n) * s
    scale = np.max(np.abs(ref))
    for rowmajor in (True, False):
        re, im = fft_vmem(sp, sign, interpret=True, levels=9, scale=s,
                          rowmajor_out=rowmajor)
        got = np.asarray(re) + 1j * np.asarray(im)
        np.testing.assert_allclose(got, ref, atol=1e-4 * scale, rtol=0)


def test_vmemfft_sublane_tb_override_and_determinism():
    n = 1 << 10
    x = (RNG.standard_normal((6, n)) + 1j * RNG.standard_normal((6, n)))
    sp = (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    ar, ai = fft_vmem(sp, -1, interpret=True, levels=9, tb_override=2)
    br, bi = fft_vmem(sp, -1, interpret=True, levels=9, tb_override=2)
    assert np.array_equal(np.asarray(ar), np.asarray(br))
    assert np.array_equal(np.asarray(ai), np.asarray(bi))
    ref = np.fft.fft(x)
    got = np.asarray(ar) + 1j * np.asarray(ai)
    np.testing.assert_allclose(got, ref,
                               atol=1e-4 * np.max(np.abs(ref)), rtol=0)


def test_vmemfft_front2_via_levels8():
    """fft_vmem(levels=8) routes to the front-2 hybrid (identical
    output), so the A/B tool's variant plumbing exercises production
    dispatch."""
    from opencl_fft_tpu.ops.pallas.vmemfft import fft_vmem_front2
    n = 1 << 18
    x = (RNG.standard_normal((1, n)) + 1j * RNG.standard_normal((1, n)))
    sp = (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    ar, ai = fft_vmem(sp, -1, interpret=True, levels=8)
    br, bi = fft_vmem_front2(sp, -1, interpret=True)
    assert np.array_equal(np.asarray(ar), np.asarray(br))
    assert np.array_equal(np.asarray(ai), np.asarray(bi))


def test_deinterleave_matrices_are_exact_partition():
    """M1/M2 must be one-hot (bit-exact on the MXU) and together cover
    every (Yre, Yim) element exactly once: [y @ M1, y @ M2] is a
    permutation of y — the interleave is lossless."""
    from opencl_fft_tpu.ops.pallas.blockstep import _deinterleave_np

    for b in (128, 512):
        m1, m2 = _deinterleave_np(b)
        both = np.concatenate([m1, m2], axis=1)        # (2b, 2b)
        assert ((both == 0) | (both == 1)).all()
        assert (both.sum(axis=0) == 1).all()           # each output: 1 source
        assert (both.sum(axis=1) == 1).all()           # each source used once
        y = RNG.standard_normal((1, 2 * b)).astype(np.float32)
        time = np.concatenate([y @ m1, y @ m2], axis=1)[0]
        np.testing.assert_array_equal(time[0::2], y[0, :b])
        np.testing.assert_array_equal(time[1::2], y[0, b:])


@pytest.mark.parametrize("bin0_mode", ["exact", "compat"])
def test_stream_kernel_matches_scan(bin0_mode):
    """The grid-streamed whole-scan kernel (pallas='stream') produces the
    same outputs and the same continued state as the per-block scan,
    including across chained calls (state round-trips through the
    ring <-> window translation)."""
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb = 128, 8, 20
    cfg_s = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream",
                          bin0_mode=bin0_mode)
    cfg_o = P.PconvConfig(pts=pts, nparts=nparts, pallas="off",
                          bin0_mode=bin0_mode)
    assert cfg_s._use_stream_kernel()
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
                               atol=2e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(o_s2), np.asarray(o_o2),
                               atol=2e-5 * scale, rtol=0)
    assert int(st_s.wp) == int(st_o.wp)
    # the ring holds forward spectra only; both paths compute them with
    # the same one-matmul forward, so the reconstructed ring is bit-exact
    np.testing.assert_array_equal(np.asarray(st_s.spec_x_re),
                                  np.asarray(st_o.spec_x_re))
    np.testing.assert_array_equal(np.asarray(st_s.spec_x_im),
                                  np.asarray(st_o.spec_x_im))


def test_stream_kernel_gate():
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.pallas.streamstep import (
        fits_vmem_streamstep, fits_vmem_streamstep_tv)

    assert fits_vmem_streamstep(256, 512)          # headline shape
    assert fits_vmem_streamstep(128, 1024)
    assert not fits_vmem_streamstep(64, 2048)      # tables blow the budget
    assert not fits_vmem_streamstep(4, 128)        # nparts too small
    # the TV kernel keeps the h ring resident too; its measured compile
    # envelope (tools/vmem_probe.py) is a QUARTER of the LTI kernel's:
    # (2048, 512) compiles LTI but OOMs TV at 121.19 MB (this exact
    # false-admit crashed the r3 sweep512 run)
    assert fits_vmem_streamstep(4096, 512)
    assert not fits_vmem_streamstep(8192, 512)     # oomed at 127.27 MB
    assert not fits_vmem_streamstep_tv(4096, 512)
    assert not fits_vmem_streamstep_tv(2048, 512)  # oomed at 121.19 MB
    assert fits_vmem_streamstep_tv(1024, 512)      # measured pass
    cfg_big = P.PconvConfig(pts=512, nparts=4096, pallas="stream")
    assert cfg_big._use_stream_kernel()
    assert not cfg_big._use_stream_kernel(tv=True)
    # stream mode never engages the per-block kernel gates
    cfg = P.PconvConfig(pts=512, nparts=256, pallas="stream")
    assert not cfg._use_pallas_blockstep()
    assert not cfg._use_pallas_blockstep_fwd()
    assert not cfg._use_pallas_mac()
    # bf16 rings and f64 stay off the kernel
    assert not P.PconvConfig(pts=512, nparts=256, pallas="stream",
                             ring_dtype="bf16")._use_stream_kernel()


def test_stream_tv_kernel_matches_scan():
    """TV whole-scan kernel == per-block TV scan (outputs + continued
    state, including the in-kernel h-ring updates at decrementing wp2
    and the sub-group remainder path)."""
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb = 128, 8, 21       # 2 groups + 5 remainder
    cfg_s = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream")
    cfg_o = P.PconvConfig(pts=pts, nparts=nparts, pallas="off")
    bx = jnp.asarray(RNG.standard_normal((nb, pts)), jnp.float32)
    bh = jnp.asarray(RNG.standard_normal((nb, pts)) * 0.3, jnp.float32)
    st_s, o_s = P.pconv_stream_tv(cfg_s, P.pconv_init(cfg_s), bx, bh)
    st_o, o_o = P.pconv_stream_tv(cfg_o, P.pconv_init(cfg_o), bx, bh)
    scale = float(jnp.abs(o_o).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_o),
                               atol=2e-5 * scale, rtol=0)
    assert int(st_s.wp) == int(st_o.wp)
    assert int(st_s.wp2) == int(st_o.wp2)
    np.testing.assert_array_equal(np.asarray(st_s.spec_h_re),
                                  np.asarray(st_o.spec_h_re))
    np.testing.assert_array_equal(np.asarray(st_s.spec_x_re),
                                  np.asarray(st_o.spec_x_re))
    # continuation across calls
    st_s, o_s2 = P.pconv_stream_tv(cfg_s, st_s, bx, bh)
    st_o, o_o2 = P.pconv_stream_tv(cfg_o, st_o, bx, bh)
    np.testing.assert_allclose(np.asarray(o_s2), np.asarray(o_o2),
                               atol=2e-5 * scale, rtol=0)


def test_stream_batched_kernel_matches_vmapped_scan():
    """Batched (multi-channel) whole-scan kernel == vmapped per-block
    scan: outputs, shared ring pointer, per-channel rings and tails,
    chained continuation."""
    from opencl_fft_tpu.models.convolver import (_vmapped, _vmapped_push,
                                                 batched_state)
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb, B = 128, 8, 21, 3
    cfg_s = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream")
    cfg_o = P.PconvConfig(pts=pts, nparts=nparts, pallas="off")
    irs = jnp.asarray(RNG.standard_normal((B, pts * nparts)) * 0.1,
                      jnp.float32)
    blocks = jnp.asarray(RNG.standard_normal((nb, B, pts)), jnp.float32)
    st_s = _vmapped_push(cfg_s)(batched_state(cfg_s, B), irs)
    st_o = _vmapped_push(cfg_o)(batched_state(cfg_o, B), irs)
    st_s, o_s = P.pconv_stream_batched(cfg_s, st_s, blocks)
    step = _vmapped(P.pconv_step, cfg_o)
    st_o, o_o = jax.lax.scan(lambda s, b: step(s, b), st_o, blocks)
    scale = float(jnp.abs(o_o).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_o),
                               atol=2e-5 * scale, rtol=0)
    assert int(st_s.wp) == int(st_o.wp)
    np.testing.assert_array_equal(np.asarray(st_s.spec_x_re),
                                  np.asarray(st_o.spec_x_re))
    np.testing.assert_array_equal(np.asarray(st_s.tail),
                                  np.asarray(st_o.tail))
    st_s, o_s2 = P.pconv_stream_batched(cfg_s, st_s, blocks)
    st_o, o_o2 = jax.lax.scan(lambda s, b: step(s, b), st_o, blocks)
    np.testing.assert_allclose(np.asarray(o_s2), np.asarray(o_o2),
                               atol=2e-5 * scale, rtol=0)


def test_stream_batched_tv_kernel_matches_vmapped_scan():
    """Batched TV whole-scan kernel == vmapped per-block TV scan:
    outputs, shared ring pointers, per-channel x/h rings and tails,
    chained continuation (serving analog of cl_conv.cpp:460-548)."""
    from opencl_fft_tpu.models.convolver import batched_state
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb, B = 128, 8, 21, 3
    cfg_s = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream")
    cfg_o = P.PconvConfig(pts=pts, nparts=nparts, pallas="off")
    bx = jnp.asarray(RNG.standard_normal((nb, B, pts)), jnp.float32)
    bh = jnp.asarray(RNG.standard_normal((nb, B, pts)) * 0.1, jnp.float32)
    st_s, o_s = P.pconv_stream_batched_tv(
        cfg_s, batched_state(cfg_s, B), bx, bh)
    st_o, o_o = P.pconv_stream_batched_tv(
        cfg_o, batched_state(cfg_o, B), bx, bh)
    scale = float(jnp.abs(o_o).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_o),
                               atol=2e-5 * scale, rtol=0)
    assert int(st_s.wp) == int(st_o.wp)
    assert int(st_s.wp2) == int(st_o.wp2)
    np.testing.assert_array_equal(np.asarray(st_s.spec_x_re),
                                  np.asarray(st_o.spec_x_re))
    np.testing.assert_array_equal(np.asarray(st_s.spec_h_re),
                                  np.asarray(st_o.spec_h_re))
    np.testing.assert_array_equal(np.asarray(st_s.spec_h_im),
                                  np.asarray(st_o.spec_h_im))
    np.testing.assert_array_equal(np.asarray(st_s.tail),
                                  np.asarray(st_o.tail))
    # continuation across calls (non-zero wp/wp2 entry)
    st_s, o_s2 = P.pconv_stream_batched_tv(cfg_s, st_s, bx, bh)
    st_o, o_o2 = P.pconv_stream_batched_tv(cfg_o, st_o, bx, bh)
    np.testing.assert_allclose(np.asarray(o_s2), np.asarray(o_o2),
                               atol=2e-5 * scale, rtol=0)


def test_stream_batched_tv_channel_grouping():
    """The channel-group split (VMEM budget) is invisible: forcing tiny
    groups by monkeypatching the fits gate gives bit-identical results
    to one full-width launch."""
    from opencl_fft_tpu.models.convolver import batched_state
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.pallas import streamstep as S

    pts, nparts, nb, B = 128, 8, 16, 4
    cfg = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream")
    bx = jnp.asarray(RNG.standard_normal((nb, B, pts)), jnp.float32)
    bh = jnp.asarray(RNG.standard_normal((nb, B, pts)) * 0.1, jnp.float32)
    st_w, o_w = P.pconv_stream_batched_tv(
        cfg, batched_state(cfg, B), bx, bh)

    # the wrapper imports the gate lazily per call, so patching the
    # module symbol reaches it
    orig = S.fits_vmem_streamstep_batched_tv
    try:
        S_fits = lambda np_, b, batch: orig(np_, b, batch) and batch <= 2
        S.fits_vmem_streamstep_batched_tv = S_fits
        st_g, o_g = P.pconv_stream_batched_tv(
            cfg, batched_state(cfg, B), bx, bh)
    finally:
        S.fits_vmem_streamstep_batched_tv = orig
    np.testing.assert_array_equal(np.asarray(o_w), np.asarray(o_g))
    np.testing.assert_array_equal(np.asarray(st_w.spec_x_re),
                                  np.asarray(st_g.spec_x_re))
    np.testing.assert_array_equal(np.asarray(st_w.spec_h_re),
                                  np.asarray(st_g.spec_h_re))


def test_stream_scan_segmentation_matches_single_launch(monkeypatch):
    """Long scans are cut into per-launch segments within the scoped-VMEM
    output budget (streamstep.max_scan_blocks), threading window/tail —
    and for TV the h ring and wp2 — between launches. Forcing a tiny
    segment must reproduce the single-launch scan bit-for-bit."""
    import opencl_fft_tpu.ops.pallas.streamstep as ST
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb = 128, 8, 32
    cfg = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream")
    ir = RNG.standard_normal(pts * nparts).astype(np.float32) * 0.2
    bx = jnp.asarray(RNG.standard_normal((nb, pts)), jnp.float32)
    bh = jnp.asarray(RNG.standard_normal((nb, pts)) * 0.1, jnp.float32)

    st0 = P.push_ir(cfg, P.pconv_init(cfg), ir)
    st1, o1 = P.pconv_stream(cfg, st0, bx)
    st1tv, o1tv = P.pconv_stream_tv(cfg, st0, bx, bh)

    assert ST.max_scan_blocks(nparts, pts) > nb       # single launch above
    monkeypatch.setattr(ST, "_SEG_BUDGET_CAP", 0)
    monkeypatch.setattr(ST, "_SEG_FLOOR_BYTES", 8 * pts * 4)  # seg = 8
    assert ST.max_scan_blocks(nparts, pts) == 8
    st2, o2 = P.pconv_stream(cfg, st0, bx)
    st2tv, o2tv = P.pconv_stream_tv(cfg, st0, bx, bh)

    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # TV: XLA fuses the per-segment programs differently (FMA grouping),
    # so the comparison is 1-2 ULP rather than bitwise
    sc = float(jnp.abs(o1tv).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o1tv), np.asarray(o2tv),
                               atol=3e-5 * sc, rtol=0)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st1tv), jax.tree.leaves(st2tv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5 * sc, rtol=0)


def test_batched_stream_segmentation_matches_single_launch(monkeypatch):
    """Batched (serving) wrappers segment within each channel group; a
    forced tiny segment must be bit-equal to the single launch (LTI and
    TV)."""
    import opencl_fft_tpu.ops.pallas.streamstep as ST
    from opencl_fft_tpu.models.convolver import batched_state
    from opencl_fft_tpu.ops import pconv as P

    pts, nparts, nb, nch = 128, 8, 24, 3
    cfg = P.PconvConfig(pts=pts, nparts=nparts, pallas="stream")
    st0 = batched_state(cfg, nch)
    irs = jnp.asarray(RNG.standard_normal((nch, pts * nparts)) * 0.2,
                      jnp.float32)
    import jax as _jax
    from opencl_fft_tpu.models.convolver import _vmapped_push
    st0 = _jax.jit(_vmapped_push(cfg))(st0, irs)
    bx = jnp.asarray(RNG.standard_normal((nb, nch, pts)), jnp.float32)
    bh = jnp.asarray(RNG.standard_normal((nb, nch, pts)) * 0.1, jnp.float32)

    st1, o1 = P.pconv_stream_batched(cfg, st0, bx)
    st1tv, o1tv = P.pconv_stream_batched_tv(cfg, st0, bx, bh)

    monkeypatch.setattr(ST, "_SEG_BUDGET_CAP", 0)
    monkeypatch.setattr(ST, "_SEG_FLOOR_BYTES", 8 * nch * pts * 4)
    assert ST.max_scan_blocks(nparts, pts, batch=nch) == 8
    st2, o2 = P.pconv_stream_batched(cfg, st0, bx)
    st2tv, o2tv = P.pconv_stream_batched_tv(cfg, st0, bx, bh)

    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    sc = float(jnp.abs(o1tv).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(o1tv), np.asarray(o2tv),
                               atol=3e-5 * sc, rtol=0)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st1tv), jax.tree.leaves(st2tv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5 * sc, rtol=0)
