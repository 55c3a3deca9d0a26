"""Partitioned-convolution tests: scipy oracle, reference-model parity,
streaming equivalence, state/checkpoint semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from opencl_fft_tpu.ops import pconv
from opencl_fft_tpu.ops.pconv import (PconvConfig, pconv_init, pconv_step,
                                      pconv_step_tv, pconv_stream, push_ir)

from reference_model import RefPconv

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("pts", [16, 64, 256])
def test_exact_matches_scipy(pts):
    x = RNG.standard_normal(2000).astype(np.float32)
    h = RNG.standard_normal(700).astype(np.float32)
    got = np.asarray(pconv.convolve(x, h, pts))
    ref = sps.fftconvolve(x, h)
    np.testing.assert_allclose(got, ref, atol=3e-5 * np.max(np.abs(ref)), rtol=0)


def test_ir_shorter_and_longer_than_signal():
    for nx, nh in [(100, 1000), (1000, 100), (64, 64)]:
        x = RNG.standard_normal(nx).astype(np.float32)
        h = RNG.standard_normal(nh).astype(np.float32)
        got = np.asarray(pconv.convolve(x, h, 32))
        ref = sps.fftconvolve(x, h)
        np.testing.assert_allclose(got, ref, atol=3e-5 * np.max(np.abs(ref)), rtol=0)


@pytest.mark.parametrize("nparts", [1, 3, 8])
def test_compat_matches_reference_model(nparts):
    """bin0_mode='compat' must track the literal reference math blockwise."""
    pts = 32
    cvs = pts * nparts
    ir = RNG.standard_normal(cvs).astype(np.float32)
    cfg = PconvConfig.for_ir_length(cvs, pts, bin0_mode="compat")
    state = push_ir(cfg, pconv_init(cfg), ir)
    ref = RefPconv(cvs, pts)
    ref.push_ir(ir.astype(np.float64))
    for _ in range(3 * nparts + 2):
        blk = RNG.standard_normal(pts).astype(np.float32)
        state, out = pconv_step(cfg, state, blk)
        expect = ref.convolution(blk.astype(np.float64))
        np.testing.assert_allclose(np.asarray(out), expect,
                                   atol=2e-4 * (np.max(np.abs(expect)) + 1), rtol=0)


@pytest.mark.parametrize("nparts", [2, 5])
def test_tv_matches_reference_model(nparts):
    """Time-varying path: both rings rotate (wp up, wp2 down) exactly like
    cl_conv.cpp:460-548, across multiple wrap-arounds."""
    pts = 16
    cvs = pts * nparts
    cfg = PconvConfig.for_ir_length(cvs, pts, bin0_mode="compat")
    state = pconv_init(cfg)
    ref = RefPconv(cvs, pts)
    for _ in range(4 * nparts + 3):
        b1 = RNG.standard_normal(pts).astype(np.float32)
        b2 = RNG.standard_normal(pts).astype(np.float32)
        state, out = pconv_step_tv(cfg, state, b1, b2)
        expect = ref.convolution_tv(b1.astype(np.float64), b2.astype(np.float64))
        np.testing.assert_allclose(np.asarray(out), expect,
                                   atol=2e-4 * (np.max(np.abs(expect)) + 1), rtol=0)


def test_tv_with_frozen_ir_matches_lti():
    """Streaming the same IR partitions through the TV path must converge to
    the LTI result once the IR ring has been fully written."""
    pts, nparts = 32, 4
    cvs = pts * nparts
    ir = RNG.standard_normal(cvs).astype(np.float32)
    x = RNG.standard_normal(cvs * 3).astype(np.float32)
    cfg = PconvConfig.for_ir_length(cvs, pts)

    # LTI: preload whole IR
    st_lti = push_ir(cfg, pconv_init(cfg), ir)
    # TV: stream IR partitions cyclically alongside the input.
    # After the first nparts steps the spec2 ring holds exactly the same
    # frames as push_ir laid down (write order wp2-- matches).
    st_tv = pconv_init(cfg)
    outs_l, outs_t = [], []
    blocks = x.reshape(-1, pts)
    for i, blk in enumerate(blocks):
        st_lti, ol = pconv_step(cfg, st_lti, blk)
        st_tv, ot = pconv_step_tv(cfg, st_tv, blk,
                                  ir.reshape(-1, pts)[i % nparts])
        outs_l.append(np.asarray(ol))
        outs_t.append(np.asarray(ot))
    # compare after warmup of one full IR cycle
    a = np.concatenate(outs_l[nparts:])
    b = np.concatenate(outs_t[nparts:])
    np.testing.assert_allclose(b, a, atol=1e-4 * np.max(np.abs(a)), rtol=0)


def test_streaming_equals_scan():
    pts, nparts = 32, 4
    cfg = PconvConfig.for_ir_length(pts * nparts, pts)
    ir = RNG.standard_normal(pts * nparts).astype(np.float32)
    blocks = RNG.standard_normal((10, pts)).astype(np.float32)
    st = push_ir(cfg, pconv_init(cfg), ir)
    st2 = st
    outs = []
    for b in blocks:
        st, o = pconv_step(cfg, st, b)
        outs.append(np.asarray(o))
    _, scanned = pconv_stream(cfg, st2, jnp.asarray(blocks))
    ref = np.stack(outs)
    # eager and scan-compiled paths fuse differently; allow f32 noise
    np.testing.assert_allclose(np.asarray(scanned), ref,
                               atol=2e-5 * np.max(np.abs(ref)), rtol=0)


def test_state_is_serializable_checkpoint_resume():
    """SURVEY §5.4: state is an explicit pytree => checkpoint/resume is free.
    Saving at block k and resuming must reproduce the continuous stream."""
    pts, nparts = 16, 3
    cfg = PconvConfig.for_ir_length(pts * nparts, pts)
    ir = RNG.standard_normal(pts * nparts).astype(np.float32)
    blocks = RNG.standard_normal((8, pts)).astype(np.float32)
    st = push_ir(cfg, pconv_init(cfg), ir)
    outs_cont = []
    for b in blocks:
        st, o = pconv_step(cfg, st, b)
        outs_cont.append(np.asarray(o))

    st = push_ir(cfg, pconv_init(cfg), ir)
    for b in blocks[:4]:
        st, _ = pconv_step(cfg, st, b)
    snapshot = jax.tree.map(np.asarray, st)            # serialize
    resumed = jax.tree.map(jnp.asarray, snapshot)      # restore
    outs_res = []
    for b in blocks[4:]:
        resumed, o = pconv_step(cfg, resumed, b)
        outs_res.append(np.asarray(o))
    np.testing.assert_array_equal(np.stack(outs_res), np.stack(outs_cont[4:]))


def test_deterministic_rerun():
    """Partition accumulation is a deterministic tree reduction (vs the
    reference's nondeterministic float atomics, cl_conv_kernels.h:29-44)."""
    pts = 64
    cfg = PconvConfig.for_ir_length(pts * 8, pts)
    ir = RNG.standard_normal(pts * 8).astype(np.float32)
    blk = RNG.standard_normal(pts).astype(np.float32)
    st = push_ir(cfg, pconv_init(cfg), ir)
    _, a = pconv_step(cfg, st, blk)
    _, b = pconv_step(cfg, st, blk)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_push_ir_preserves_wp2():
    cfg = PconvConfig.for_ir_length(64, 16)
    st = pconv_init(cfg)
    st2 = push_ir(cfg, st, np.ones(64, np.float32))
    assert int(st2.wp2) == int(st.wp2)


def test_latency_is_zero_at_engine_level():
    """The engine itself outputs the convolution aligned to its input block
    (the extra one-partition latency lives in the opcode layer,
    csound/opcode.cpp:240-249 — tested in test_stream.py)."""
    pts = 32
    cfg = PconvConfig.for_ir_length(pts, pts)
    ir = np.zeros(pts, np.float32)
    ir[0] = 1.0                                        # identity IR
    st = push_ir(cfg, pconv_init(cfg), ir)
    blk = RNG.standard_normal(pts).astype(np.float32)
    _, out = pconv_step(cfg, st, blk)
    np.testing.assert_allclose(np.asarray(out), blk, atol=1e-5)


def test_config_validation():
    with pytest.raises(ValueError):
        PconvConfig(pts=12, nparts=4)
    with pytest.raises(ValueError):
        PconvConfig.for_ir_length(100, 32)
    with pytest.raises(ValueError):
        PconvConfig(pts=16, nparts=2, bin0_mode="banana")
    cfg = PconvConfig.for_ir_length(64, 16)
    with pytest.raises(ValueError):
        push_ir(cfg, pconv_init(cfg), np.zeros(63, np.float32))


def test_oneshot_matches_scipy():
    from opencl_fft_tpu.ops.pconv import convolve_oneshot
    for nx, nh in [(1000, 300), (100, 5000), (333, 77)]:
        x = RNG.standard_normal(nx).astype(np.float32)
        h = RNG.standard_normal(nh).astype(np.float32)
        got = np.asarray(convolve_oneshot(x, h))
        ref = sps.fftconvolve(x, h)
        np.testing.assert_allclose(got, ref, atol=3e-5 * np.max(np.abs(ref)),
                                   rtol=0)


def test_oneshot_equals_streaming():
    from opencl_fft_tpu.ops.pconv import convolve_oneshot
    x = RNG.standard_normal(2000).astype(np.float32)
    h = RNG.standard_normal(512).astype(np.float32)
    a = np.asarray(convolve_oneshot(x, h))
    b = np.asarray(pconv.convolve(x, h, 64))
    np.testing.assert_allclose(a, b, atol=5e-5 * np.max(np.abs(a)), rtol=0)


def test_bf16_ring_mode():
    """ring_dtype='bf16' halves ring bandwidth at ~1e-3 relative error."""
    x = RNG.standard_normal(4096).astype(np.float32)
    h = RNG.standard_normal(1024).astype(np.float32)
    ref = sps.fftconvolve(x, h)
    cfg = PconvConfig.for_ir_length(1024, 128, ring_dtype="bf16")
    st = push_ir(cfg, pconv_init(cfg), jnp.asarray(h))
    _, out = pconv_stream(cfg, st, jnp.asarray(x.reshape(-1, 128)))
    got = np.asarray(out).reshape(-1)
    err = np.max(np.abs(got - ref[: got.size])) / np.max(np.abs(ref))
    assert err < 5e-3
    with pytest.raises(ValueError):
        PconvConfig(pts=16, nparts=2, ring_dtype="fp4")


@pytest.mark.parametrize("k,ring", [(1, "f32"), (3, "f32"), (8, "f32"),
                                    (3, "bf16"), (8, "bf16")])
def test_chunk_bitwise_equals_sequential(k, ring):
    """pconv_chunk(K blocks) must reproduce K sequential steps exactly —
    including bf16 rings, where the chunk MAC must consume fresh frames
    ring-quantized exactly as sequential steps read them back (ADVICE r1)."""
    from opencl_fft_tpu.ops.pconv import pconv_chunk
    pts, nparts = 32, 8
    cfg = PconvConfig.for_ir_length(pts * nparts, pts, ring_dtype=ring)
    ir = RNG.standard_normal(cfg.cvs).astype(np.float32)
    blocks = RNG.standard_normal((24, pts)).astype(np.float32)
    st = push_ir(cfg, pconv_init(cfg), jnp.asarray(ir))
    seq = []
    for b in blocks:
        st, o = pconv_step(cfg, st, jnp.asarray(b))
        seq.append(np.asarray(o))
    seq = np.stack(seq)
    st2 = push_ir(cfg, pconv_init(cfg), jnp.asarray(ir))
    outs = []
    for i in range(0, 24, k):
        st2, o = pconv_chunk(cfg, st2, jnp.asarray(blocks[i: i + k]))
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs), seq)


def test_chunk_size_validation():
    from opencl_fft_tpu.ops.pconv import pconv_chunk
    cfg = PconvConfig.for_ir_length(64, 16)   # nparts = 4
    st = pconv_init(cfg)
    with pytest.raises(ValueError):
        pconv_chunk(cfg, st, np.zeros((5, 16), np.float32))


@pytest.mark.parametrize("k,ring", [(1, "f32"), (3, "f32"), (8, "f32"),
                                    (3, "bf16"), (8, "bf16")])
def test_chunk_tv_bitwise_equals_sequential(k, ring):
    """pconv_chunk_tv must reproduce K sequential TV steps exactly,
    including the opposing ring rotations (wp++ / wp2--) and bf16 rings."""
    from opencl_fft_tpu.ops.pconv import pconv_chunk_tv
    pts, nparts = 32, 8
    cfg = PconvConfig.for_ir_length(pts * nparts, pts, ring_dtype=ring)
    bx = RNG.standard_normal((24, pts)).astype(np.float32)
    bh = RNG.standard_normal((24, pts)).astype(np.float32)
    st = pconv_init(cfg)
    seq = []
    for i in range(24):
        st, o = pconv_step_tv(cfg, st, jnp.asarray(bx[i]), jnp.asarray(bh[i]))
        seq.append(np.asarray(o))
    st2 = pconv_init(cfg)
    outs = []
    for i in range(0, 24, k):
        st2, o = pconv_chunk_tv(cfg, st2, jnp.asarray(bx[i: i + k]),
                                jnp.asarray(bh[i: i + k]))
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs), np.stack(seq))


def test_forward_partition_honors_explicit_impl():
    """cfg.impl must select the actual forward transform, not just the
    inverse (review finding r3: the fused-table shortcut ignored an
    explicit impl='xla'/'stockham'). Engines agree to f32 roundoff and
    the non-default impl genuinely runs its own path (both still match
    the scipy oracle)."""
    import jax.numpy as jnp
    import numpy as np
    from scipy import signal as sps

    rng = np.random.default_rng(7)
    x = rng.standard_normal(1024).astype(np.float32)
    h = rng.standard_normal(256).astype(np.float32)
    outs = {}
    for impl in ("auto", "xla", "stockham"):
        cfg = PconvConfig.for_ir_length(256, 64, impl=impl)
        st = push_ir(cfg, pconv_init(cfg), jnp.asarray(h))
        blocks = jnp.asarray(x.reshape(-1, 64))
        _, y = pconv_stream(cfg, st, blocks)
        outs[impl] = np.asarray(y).reshape(-1)
    ref = sps.fftconvolve(x, h)[: x.size]
    for impl, y in outs.items():
        np.testing.assert_allclose(y, ref, atol=5e-4 * np.abs(ref).max(),
                                   err_msg=impl)
    np.testing.assert_allclose(outs["xla"], outs["auto"],
                               atol=2e-5 * np.abs(ref).max())


# -- crossfaded IR replacement (beyond parity) ---------------------------

def test_xfade_blends_two_exact_convolutions():
    """During a crossfaded IR swap the output equals the per-sample blend
    (1-r)*conv(x, h_old) + r*conv(x, h_new) over the WHOLE input history
    (both paths exact: the incoming path's OLA tail is reconstructed from
    the retained input ring), and after the fade it is conv(x, h_new)."""
    pts, nparts, fade_blocks = 64, 6, 4
    cfg = PconvConfig.for_ir_length(pts * nparts, pts)
    h_old = RNG.standard_normal(cfg.cvs).astype(np.float32)
    h_new = RNG.standard_normal(cfg.cvs).astype(np.float32)
    nblocks, start = 16, 7                      # fade begins mid-stream
    x = RNG.standard_normal(nblocks * pts).astype(np.float32)
    blocks = x.reshape(nblocks, pts)

    st = pconv.push_ir(cfg, pconv_init(cfg), h_old)
    outs = []
    xf = None
    for i in range(nblocks):
        if i == start:
            xf = pconv.pconv_begin_xfade(cfg, st, h_new)
        if xf is not None and i - start < fade_blocks:
            j = i - start
            ramp = (np.arange(pts, dtype=np.float32) + 1 + j * pts) \
                / np.float32(fade_blocks * pts)
            xf, o = pconv.pconv_step_xfade(cfg, xf, blocks[i], ramp)
            if j == fade_blocks - 1:
                st, xf = xf.state, None
        else:
            st, o = pconv_step(cfg, st, blocks[i])
        outs.append(np.asarray(o))
    got = np.concatenate(outs)

    y_old = sps.fftconvolve(x, h_old)[: got.size]
    y_new = sps.fftconvolve(x, h_new)[: got.size]
    r = np.zeros(got.size, np.float32)
    r[(start + fade_blocks) * pts:] = 1.0
    t = np.arange(fade_blocks * pts, dtype=np.float32)
    r[start * pts: (start + fade_blocks) * pts] = \
        (t + 1) / np.float32(fade_blocks * pts)
    expect = (1 - r) * y_old + r * y_new
    tol = 3e-5 * np.max(np.abs(expect))
    np.testing.assert_allclose(got, expect, atol=tol, rtol=0)


def test_xfade_is_jittable_and_deterministic():
    pts, nparts = 32, 4
    cfg = PconvConfig.for_ir_length(pts * nparts, pts)
    h0 = RNG.standard_normal(cfg.cvs).astype(np.float32)
    h1 = RNG.standard_normal(cfg.cvs).astype(np.float32)
    blk = RNG.standard_normal(pts).astype(np.float32)
    ramp = np.linspace(0, 1, pts, dtype=np.float32)

    import functools
    begin = jax.jit(functools.partial(pconv.pconv_begin_xfade, cfg))
    step = jax.jit(functools.partial(pconv.pconv_step_xfade, cfg))
    st = pconv.push_ir(cfg, pconv_init(cfg), h0)
    st, _ = pconv_step(cfg, st, blk)
    a = np.asarray(step(begin(st, h1), blk, ramp)[1])
    b = np.asarray(step(begin(st, h1), blk, ramp)[1])
    np.testing.assert_array_equal(a, b)        # bitwise rerun stability
