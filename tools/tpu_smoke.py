"""On-device validation sweep: run every compute path on the visible chip
and check against numpy/scipy oracles. The pytest suite runs on CPU (see
tests/conftest.py); this script is the hardware counterpart.

Run:  python tools/tpu_smoke.py
Exit code 0 iff every check passes.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

FAILED = []


def check(name, err, tol):
    ok = err < tol
    print(f"{'PASS' if ok else 'FAIL'}  {name}: err={err:.2e} (tol {tol:.0e})",
          flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import jax.numpy as jnp
    from scipy import signal as sps

    from opencl_fft_tpu.ops import dconv as D
    from opencl_fft_tpu.ops import pconv as P
    from opencl_fft_tpu.ops.fft import fft_split
    from opencl_fft_tpu.ops.rfft import irfft_split, rfft_split
    from opencl_fft_tpu.ops.pallas.mac import spectral_mac

    rng = np.random.default_rng(0)

    # C2C FFT across sizes
    for n in [16, 1024, 65536]:
        x = rng.standard_normal((4, n)).astype(np.float32)
        y = rng.standard_normal((4, n)).astype(np.float32)
        re, im = fft_split((jnp.asarray(x), jnp.asarray(y)), -1)
        got = np.asarray(re) + 1j * np.asarray(im)
        ref = np.fft.fft(x + 1j * y)
        check(f"cfft n={n}", np.max(np.abs(got - ref)) / np.max(np.abs(ref)), 3e-5)

    # VMEM-resident kernels compiled on-chip (2-level transposed-out at a
    # bench-sweep working set; 3-level at its smallest auto size)
    from opencl_fft_tpu.ops.pallas.vmemfft import fft_vmem
    n2 = 1 << 12
    xb = rng.standard_normal((1024, n2)).astype(np.float32)
    yb = rng.standard_normal((1024, n2)).astype(np.float32)
    re, im = fft_vmem((jnp.asarray(xb), jnp.asarray(yb)), -1, levels=2)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(xb + 1j * yb)
    check("vmemfft l2 n=4096", np.max(np.abs(got - ref)) / np.max(np.abs(ref)),
          1e-4)

    # fast-math (auto leaf precision) error budget: bf16x3 leaves for
    # radix >= 64 must keep the large-size roundtrip inside 1e-4 relative
    # and cost vs full-f32 mode no more than ~3x the f32 epsilon
    from opencl_fft_tpu.ops.fft import set_fast_math
    for n in [1 << 14, 1 << 20]:
        xr = rng.standard_normal((2, n)).astype(np.float32)
        xi = rng.standard_normal((2, n)).astype(np.float32)
        scale = np.max(np.abs(xr + 1j * xi))
        def rt(mode):
            set_fast_math(mode)
            fr, fi = fft_split((jnp.asarray(xr), jnp.asarray(xi)), -1)
            br, bi = fft_split((fr, fi), +1)
            err = np.max(np.abs((np.asarray(br) / n - xr) +
                                1j * (np.asarray(bi) / n - xi)))
            return err / scale
        err_auto = rt(None)
        err_off = rt(False)
        err_turbo = rt("turbo")
        set_fast_math(None)
        check(f"fast-math roundtrip budget n={n}", err_auto, 1e-4)
        check(f"full-f32 roundtrip n={n}", err_off, 2e-5)
        # pure-bf16 leaves: ~4e-3/matmul over the roundtrip's stages
        check(f"turbo roundtrip budget n={n}", err_turbo, 5e-2)

    # Bluestein
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    re, im = fft_split((jnp.asarray(x), jnp.zeros_like(jnp.asarray(x))), -1)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(x)
    check("bluestein n=1000", np.max(np.abs(got - ref)) / np.max(np.abs(ref)), 5e-5)

    # rfft roundtrip — auto mode runs the bf16x3 leaves, so the bar is
    # the fast-math budget (~1.5e-5/matmul, same 3e-5 as the cfft
    # checks above; the old 1e-5 pin only held for plans with fewer
    # levels at this size and broke on the r3 plan re-tune — verified
    # bit-identical against the pre-fused-scale formulation)
    r = rng.standard_normal((2, 4096)).astype(np.float32)
    back = np.asarray(irfft_split(rfft_split(jnp.asarray(r))))
    check("rfft roundtrip", np.max(np.abs(back - r)) / np.max(np.abs(r)), 3e-5)

    # partitioned convolution vs scipy
    pts = 256
    ir = rng.standard_normal(pts * 8).astype(np.float32)
    sig = rng.standard_normal(pts * 16).astype(np.float32)
    got = np.asarray(P.convolve(jnp.asarray(sig), jnp.asarray(ir), pts))
    ref = sps.fftconvolve(sig, ir)
    check("pconv vs scipy", np.max(np.abs(got - ref)) / np.max(np.abs(ref)), 5e-5)

    # one-shot convolution
    got = np.asarray(P.convolve_oneshot(jnp.asarray(sig), jnp.asarray(ir)))
    check("oneshot conv", np.max(np.abs(got - ref)) / np.max(np.abs(ref)), 5e-5)

    # crossfaded IR hot-swap: blend of the two exact convolutions
    cfg_xf = P.PconvConfig.for_ir_length(pts * 4, pts)
    h_old = rng.standard_normal(cfg_xf.cvs).astype(np.float32)
    h_new = rng.standard_normal(cfg_xf.cvs).astype(np.float32)
    xsig = rng.standard_normal(8 * pts).astype(np.float32)
    st_xf = P.push_ir(cfg_xf, P.pconv_init(cfg_xf), h_old)
    outs, xf, K, start = [], None, 2, 3
    for i in range(8):
        blk = jnp.asarray(xsig[i * pts:(i + 1) * pts])
        if i == start:
            xf = P.pconv_begin_xfade(cfg_xf, st_xf, h_new)
        if xf is not None and i - start < K:
            ramp = (np.arange(pts, dtype=np.float32) + 1
                    + (i - start) * pts) / np.float32(K * pts)
            xf, o = P.pconv_step_xfade(cfg_xf, xf, blk, jnp.asarray(ramp))
            if i - start == K - 1:
                st_xf, xf = xf.state, None
        else:
            st_xf, o = P.pconv_step(cfg_xf, st_xf, blk)
        outs.append(np.asarray(o))
    gotx = np.concatenate(outs)
    y0 = sps.fftconvolve(xsig, h_old)[: gotx.size]
    y1 = sps.fftconvolve(xsig, h_new)[: gotx.size]
    rv = np.zeros(gotx.size, np.float32)
    rv[start * pts:(start + K) * pts] = (np.arange(K * pts) + 1) / (K * pts)
    rv[(start + K) * pts:] = 1.0
    expx = (1 - rv) * y0 + rv * y1
    check("IR hot-swap blend", np.max(np.abs(gotx - expx)) / np.max(np.abs(expx)),
          5e-5)

    # direct convolution
    h = rng.standard_normal(128).astype(np.float32)
    got = np.asarray(D.convolve_direct(jnp.asarray(sig[:2048]), jnp.asarray(h),
                                       vsize=256))
    ref = np.convolve(sig[:2048], h)
    check("dconv vs numpy", np.max(np.abs(got - ref)) / np.max(np.abs(ref)), 3e-5)

    # pallas MAC kernel (compiled)
    np_, bins = 64, 256
    base = [rng.standard_normal((np_, bins)).astype(np.float32) for _ in range(2)]
    x2 = tuple(jnp.asarray(np.concatenate([b, b], 0)) for b in base)
    hh = [rng.standard_normal((np_, bins)).astype(np.float32) for _ in range(2)]
    r_, i_ = spectral_mac(x2, tuple(map(jnp.asarray, hh)), 5, 2.0)
    idx = (5 + np.arange(np_)) % np_
    gx = [b[idx] for b in base]
    er = gx[0] * hh[0] - gx[1] * hh[1]
    ei = gx[0] * hh[1] + gx[1] * hh[0]
    er[:, 0] = 2.0 * gx[0][:, 0] * hh[0][:, 0]
    ei[:, 0] = 2.0 * gx[1][:, 0] * hh[1][:, 0]
    err = max(np.max(np.abs(np.asarray(r_) - er.sum(0))),
              np.max(np.abs(np.asarray(i_) - ei.sum(0))))
    scale = np.max(np.abs(er.sum(0))) + 1e-9
    check("pallas MAC", err / scale, 1e-4)

    # TV streaming against the literal reference model
    sys.path.insert(0, "tests")
    from reference_model import RefPconv
    cfg = P.PconvConfig.for_ir_length(64 * 4, 64, bin0_mode="compat")
    st = P.pconv_init(cfg)
    model = RefPconv(64 * 4, 64)
    worst = 0.0
    for _ in range(10):
        b1 = rng.standard_normal(64).astype(np.float32)
        b2 = rng.standard_normal(64).astype(np.float32)
        st, out = P.pconv_step_tv(cfg, st, jnp.asarray(b1), jnp.asarray(b2))
        exp = model.convolution_tv(b1.astype(np.float64), b2.astype(np.float64))
        worst = max(worst, np.max(np.abs(np.asarray(out) - exp)) /
                    (np.max(np.abs(exp)) + 1e-9))
    check("tvconv vs reference model", worst, 5e-4)

    # chunked modes bit-match sequential streaming on device
    cfg2 = P.PconvConfig.for_ir_length(64 * 8, 64)
    irc = rng.standard_normal(64 * 8).astype(np.float32)
    bx = rng.standard_normal((16, 64)).astype(np.float32)
    bh = rng.standard_normal((16, 64)).astype(np.float32)
    st_a = P.push_ir(cfg2, P.pconv_init(cfg2), jnp.asarray(irc))
    seq = []
    for b in bx:
        st_a, o = P.pconv_step(cfg2, st_a, jnp.asarray(b))
        seq.append(np.asarray(o))
    st_b = P.push_ir(cfg2, P.pconv_init(cfg2), jnp.asarray(irc))
    ch = []
    for i in range(0, 16, 8):
        st_b, o = P.pconv_chunk(cfg2, st_b, jnp.asarray(bx[i:i + 8]))
        ch.append(np.asarray(o))
    d = np.max(np.abs(np.concatenate(ch) - np.stack(seq)))
    check("pconv_chunk == sequential", d / (np.max(np.abs(seq)) + 1e-9), 1e-6)

    # the measured-winner Pallas paths (_tuned.WINNERS) must agree with
    # the XLA step at the configs auto-mode routes to them. 'stream'
    # winners are whole-scan kernels — drive them through pconv_stream
    # (>= 8 blocks engages the grid kernel; 14 covers the remainder path)
    import jax as _jax
    from opencl_fft_tpu.ops.pallas import _tuned
    for (nparts_w, bins_w), mode in sorted(_tuned.WINNERS.items()):
        if mode == "xla" or bins_w > 1024:     # keep smoke light
            continue
        pts_w, ir_w = bins_w, nparts_w * bins_w
        irw = rng.standard_normal(ir_w).astype(np.float32)
        nblk = 14 if mode in ("stream", "split") else 6
        bxw = rng.standard_normal((nblk, pts_w)).astype(np.float32)
        outs = {}
        for m in ("off", mode):
            cfgm = P.PconvConfig.for_ir_length(ir_w, pts_w, pallas=m)
            stm = P.push_ir(cfgm, P.pconv_init(cfgm), jnp.asarray(irw))
            if m in ("stream", "split"):
                _, ys = _jax.jit(lambda s, b, c=cfgm: P.pconv_stream(c, s, b)
                                 )(stm, jnp.asarray(bxw))
                outs[m] = np.asarray(ys)
            else:
                ys = []
                for b in bxw:
                    stm, o = P.pconv_step(cfgm, stm, jnp.asarray(b))
                    ys.append(np.asarray(o))
                outs[m] = np.stack(ys)
        err = np.max(np.abs(outs[mode] - outs["off"]))
        scale = np.max(np.abs(outs["off"])) + 1e-9
        check(f"pallas '{mode}' == xla @ ({nparts_w},{bins_w})",
              err / scale, 1e-5)

    # half-table split kernel on-chip (its reason to exist is bins=2048,
    # but correctness is shape-independent — validate at a compile-light
    # shape; the 2048-bin compile happens in autotune_blockstep)
    cfg_sp = P.PconvConfig(pts=512, nparts=16, pallas="split")
    if cfg_sp._stream_kernel_impl() == "split":
        irw = rng.standard_normal(512 * 16).astype(np.float32)
        bxw = rng.standard_normal((14, 512)).astype(np.float32)
        cfg_of = P.PconvConfig(pts=512, nparts=16, pallas="off")
        st_sp = P.push_ir(cfg_sp, P.pconv_init(cfg_sp), jnp.asarray(irw))
        st_of = P.push_ir(cfg_of, P.pconv_init(cfg_of), jnp.asarray(irw))
        _, y_sp = _jax.jit(lambda s, b: P.pconv_stream(cfg_sp, s, b)
                           )(st_sp, jnp.asarray(bxw))
        _, y_of = _jax.jit(lambda s, b: P.pconv_stream(cfg_of, s, b)
                           )(st_of, jnp.asarray(bxw))
        err = np.max(np.abs(np.asarray(y_sp) - np.asarray(y_of)))
        check("pallas 'split' == xla @ (16,512)",
              err / (np.max(np.abs(np.asarray(y_of))) + 1e-9), 1e-5)

    # direct-FIR whole-scan kernel on-chip vs the XLA scan
    cfg_dk = D.DconvConfig(irsize=512, vsize=512, pallas="stream")
    if cfg_dk._use_stream_kernel():
        ird = rng.standard_normal(512).astype(np.float32)
        bxd = rng.standard_normal((14, 512)).astype(np.float32)
        cfg_do = D.DconvConfig(irsize=512, vsize=512, pallas="off")
        st_dk = D.push_ir(cfg_dk, D.dconv_init(cfg_dk), jnp.asarray(ird))
        st_do = D.push_ir(cfg_do, D.dconv_init(cfg_do), jnp.asarray(ird))
        _, y_dk = _jax.jit(lambda s, b: D.dconv_stream(cfg_dk, s, b)
                           )(st_dk, jnp.asarray(bxd))
        _, y_do = _jax.jit(lambda s, b: D.dconv_stream(cfg_do, s, b)
                           )(st_do, jnp.asarray(bxd))
        err = np.max(np.abs(np.asarray(y_dk) - np.asarray(y_do)))
        check("dconv 'stream' == xla @ (512,512)",
              err / (np.max(np.abs(np.asarray(y_do))) + 1e-9), 1e-5)

    # batched serving path: the channel-stacked stream kernel vs the
    # vmapped XLA scan, multi-group channel chunking exercised on-chip
    from opencl_fft_tpu.models.convolver import (_vmapped, _vmapped_push,
                                                 batched_state)
    cfgb = P.PconvConfig.for_ir_length(1 << 15, 512)
    if cfgb._use_stream_kernel():
        Bs = 3
        irsb = rng.standard_normal((Bs, 1 << 15)).astype(np.float32) * 0.1
        bxb = rng.standard_normal((14, Bs, 512)).astype(np.float32)
        stb = _jax.jit(_vmapped_push(cfgb))(batched_state(cfgb, Bs),
                                            jnp.asarray(irsb))
        _, ob_k = _jax.jit(lambda s, b: P.pconv_stream_batched(cfgb, s, b)
                           )(stb, jnp.asarray(bxb))
        cfgo = P.PconvConfig.for_ir_length(1 << 15, 512, pallas="off")
        sto = _jax.jit(_vmapped_push(cfgo))(batched_state(cfgo, Bs),
                                            jnp.asarray(irsb))
        stepo = _vmapped(P.pconv_step, cfgo)
        _, ob_x = _jax.jit(lambda s, b: _jax.lax.scan(
            lambda st, blk: stepo(st, blk), s, b))(sto, jnp.asarray(bxb))
        err = np.max(np.abs(np.asarray(ob_k) - np.asarray(ob_x)))
        scale = np.max(np.abs(np.asarray(ob_x))) + 1e-9
        check("batched stream == vmapped xla @ (64,512)x3ch", err / scale,
              1e-5)

    # batched TV serving path: both operands streaming per channel
    if cfgb._use_stream_kernel(tv=True):
        Bs = 3
        cfgk = P.PconvConfig.for_ir_length(1 << 15, 512, pallas="stream")
        cfgo = P.PconvConfig.for_ir_length(1 << 15, 512, pallas="off")
        bxb = rng.standard_normal((14, Bs, 512)).astype(np.float32)
        bhb = rng.standard_normal((14, Bs, 512)).astype(np.float32) * 0.1
        _, otv_k = _jax.jit(lambda s, x, h: P.pconv_stream_batched_tv(
            cfgk, s, x, h))(batched_state(cfgk, Bs), jnp.asarray(bxb),
                            jnp.asarray(bhb))
        _, otv_x = _jax.jit(lambda s, x, h: P.pconv_stream_batched_tv(
            cfgo, s, x, h))(batched_state(cfgo, Bs), jnp.asarray(bxb),
                            jnp.asarray(bhb))
        err = np.max(np.abs(np.asarray(otv_k) - np.asarray(otv_x)))
        scale = np.max(np.abs(np.asarray(otv_x))) + 1e-9
        check("batched TV stream == vmapped xla @ (64,512)x3ch",
              err / scale, 1e-5)

    # offline render (chunk-MAC kernel) == sequential streaming.
    # cfg2 (bins=64) is NOT kernel-eligible (bins % 128), so build a
    # dedicated eligible config — otherwise the kernel has no on-chip
    # coverage at all.
    cfg3 = P.PconvConfig.for_ir_length(128 * 16, 128)
    assert P._use_chunkmac(cfg3), "chunkmac gate unexpectedly closed"
    irc3 = rng.standard_normal(128 * 16).astype(np.float32)
    bx3 = rng.standard_normal((16, 128)).astype(np.float32)
    st_e = P.push_ir(cfg3, P.pconv_init(cfg3), jnp.asarray(irc3))
    seq3 = []
    for b in bx3:
        st_e, o = P.pconv_step(cfg3, st_e, jnp.asarray(b))
        seq3.append(np.asarray(o))
    st_f = P.push_ir(cfg3, P.pconv_init(cfg3), jnp.asarray(irc3))
    st_f, off_out = P.pconv_offline(cfg3, st_f, jnp.asarray(bx3))
    d = np.max(np.abs(np.asarray(off_out) - np.stack(seq3)))
    check("pconv_offline == sequential", d / (np.max(np.abs(seq3)) + 1e-9),
          1e-5)

    # zero-latency convolver: streamed output == offline scipy with NO
    # added latency (non-uniform Gardner partitioning over 3 engines)
    from opencl_fft_tpu.models.lowlatency import ZeroLatencyConvolver
    ir_zl = rng.standard_normal(600).astype(np.float32)
    sig_zl = rng.standard_normal(64 * 12).astype(np.float32)
    zl = ZeroLatencyConvolver(ir_zl, block=64, pmax=256)
    y_zl = np.concatenate([np.asarray(zl.process(sig_zl[i: i + 64]))
                           for i in range(0, sig_zl.size, 64)])
    ref_zl = sps.fftconvolve(sig_zl, ir_zl)[: y_zl.size]
    check("zero-latency conv vs scipy",
          np.max(np.abs(y_zl - ref_zl)) / np.max(np.abs(ref_zl)), 5e-5)

    st_c = P.pconv_init(cfg2)
    seq_tv = []
    for i in range(16):
        st_c, o = P.pconv_step_tv(cfg2, st_c, jnp.asarray(bx[i]), jnp.asarray(bh[i]))
        seq_tv.append(np.asarray(o))
    st_d = P.pconv_init(cfg2)
    ch_tv = []
    for i in range(0, 16, 8):
        st_d, o = P.pconv_chunk_tv(cfg2, st_d, jnp.asarray(bx[i:i + 8]),
                                   jnp.asarray(bh[i:i + 8]))
        ch_tv.append(np.asarray(o))
    d = np.max(np.abs(np.concatenate(ch_tv) - np.stack(seq_tv)))
    check("pconv_chunk_tv == sequential", d / (np.max(np.abs(seq_tv)) + 1e-9), 1e-6)

    from opencl_fft_tpu.models.convolver import MatrixConvolver
    cfg_m = P.PconvConfig.for_ir_length(32 * 4, 32)
    irs_m = rng.standard_normal((2, 2, cfg_m.cvs)).astype(np.float32)
    xm = rng.standard_normal((8, 2, 32)).astype(np.float32)
    mc = MatrixConvolver(cfg_m, 2, 2)
    mc.push_ir(irs_m)
    got_m = np.asarray(mc.stream(xm))                  # (8, 2, 32)
    xs_m = xm.transpose(1, 0, 2).reshape(2, -1)
    err_m = 0.0
    for o in range(2):
        ref_m = sum(sps.fftconvolve(xs_m[i], irs_m[o, i])[: 8 * 32]
                    for i in range(2))
        err_m = max(err_m, np.max(np.abs(got_m[:, o].reshape(-1) - ref_m))
                    / np.max(np.abs(ref_m)))
    check("matrix (true-stereo) conv vs scipy", err_m, 5e-5)

    print(f"\n{'ALL PASS' if not FAILED else 'FAILURES: ' + ', '.join(FAILED)}")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
