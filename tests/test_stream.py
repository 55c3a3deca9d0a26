"""Opcode-layer tests: block buffering, latency, dispatch, freeze, scaling."""

import numpy as np
import pytest
from scipy import signal as sps

from opencl_fft_tpu.stream import (ClconvProcessor, ClfftProcessor,
                                   ClrfftProcessor, CltvconvProcessor)
from opencl_fft_tpu.utils.errors import ArgumentError

RNG = np.random.default_rng(23)


def test_clfft_processor_np2_rounding():
    """Non-power-of-two lengths run a zero-padded np2-size transform
    (opcode.cpp:30-35,64)."""
    p = ClfftProcessor(12, fwd=True)
    assert p.n == 16
    x = (RNG.standard_normal(12) + 1j * RNG.standard_normal(12)).astype(np.complex64)
    got = p.process(x)
    padded = np.zeros(16, np.complex64)
    padded[:12] = x
    expect = (np.fft.fft(padded) / 16)[:12]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_clrfft_processor_roundtrip():
    fwd = ClrfftProcessor(32, True)
    inv = ClrfftProcessor(32, False)
    r = RNG.standard_normal(32).astype(np.float32)
    back = inv.process(fwd.process(r))
    np.testing.assert_allclose(back, r, atol=1e-5 * np.max(np.abs(r)))


@pytest.mark.parametrize("ksmps", [16, 48, 64, 100])
def test_clconv_latency_and_value(ksmps):
    """Partitioned branch: output equals the convolution delayed by exactly
    `parts` samples (opcode.cpp:240-249), for any host block size."""
    parts = 64
    ir = RNG.standard_normal(parts * 3).astype(np.float32)
    x = RNG.standard_normal(parts * 8).astype(np.float32)
    p = ClconvProcessor(ir, parts)
    assert p.latency == parts
    nb = x.size // ksmps
    got = np.concatenate([p.process(x[i * ksmps:(i + 1) * ksmps])
                          for i in range(nb)])
    full = sps.fftconvolve(x, ir)
    expect = np.concatenate([np.zeros(parts, np.float32), full])[: got.size]
    np.testing.assert_allclose(got, expect, atol=3e-5 * np.max(np.abs(full)), rtol=0)


def test_clconv_direct_dispatch():
    """parts == 1 selects the direct engine with no added latency
    (opcode.cpp:185,233-239)."""
    ir = RNG.standard_normal(20).astype(np.float32)
    x = RNG.standard_normal(128).astype(np.float32)
    p = ClconvProcessor(ir, parts=1, block_size=32)
    assert p.dconv and p.latency == 0
    got = np.concatenate([p.process(x[i * 32:(i + 1) * 32]) for i in range(4)])
    expect = np.convolve(x, ir)[: got.size]
    np.testing.assert_allclose(got, expect, atol=2e-5 * np.max(np.abs(expect)), rtol=0)


def test_clconv_zero_latency_dispatch():
    """parts == 0 (beyond-parity) selects the non-uniform zero-latency
    engine: long-IR streaming with latency == 0, honoring skip/scale."""
    ir = RNG.standard_normal(700).astype(np.float32)
    x = RNG.standard_normal(640).astype(np.float32)
    p = ClconvProcessor(ir, parts=0, block_size=64, skip=4, scale=0.5)
    assert p.zero_latency and p.latency == 0
    got = np.concatenate([p.process(x[i * 64:(i + 1) * 64])
                          for i in range(10)])
    expect = sps.fftconvolve(x, 0.5 * ir[4:])[: got.size]
    np.testing.assert_allclose(got, expect,
                               atol=3e-5 * np.max(np.abs(expect)), rtol=0)
    with pytest.raises(ArgumentError):
        p.process(np.zeros(32, np.float32))     # wrong block size
    with pytest.raises(ArgumentError, match="power of two"):
        ClconvProcessor(ir, parts=0, block_size=63)   # plan validation
        # speaks the surface's error dialect (not a bare ValueError)


def test_clconv_skip_size_scale():
    """Optional skip/size table args and 0dbfs IR scaling
    (opcode.cpp:181-191)."""
    table = RNG.standard_normal(100).astype(np.float32)
    x = RNG.standard_normal(512).astype(np.float32)
    p = ClconvProcessor(table, parts=32, skip=10, size=74, scale=2.0)
    got = np.concatenate([p.process(x[i * 64:(i + 1) * 64]) for i in range(8)])
    ir = table[10:74] * 2.0
    full = sps.fftconvolve(x, ir)
    expect = np.concatenate([np.zeros(32, np.float32), full])[: got.size]
    np.testing.assert_allclose(got, expect, atol=3e-5 * np.max(np.abs(full)), rtol=0)


def test_tvconv_cyclic_ir_matches_lti():
    """Streaming the IR partitions cyclically through operand 2 keeps the
    coefficient ring in exactly the push_ir layout (write order wp2--
    matches, cl_conv.cpp:385 vs :519), so cltvconv equals clconv against
    that IR — from the very first block, because the partitions missing
    early pair only with pre-stream (zero) input frames."""
    parts, nparts = 32, 4
    size = parts * nparts
    ir = RNG.standard_normal(size).astype(np.float32)
    x = RNG.standard_normal(size * 4).astype(np.float32)

    tv = CltvconvProcessor(parts, size)
    outs = [tv.process(x[i * parts:(i + 1) * parts],
                       ir[(i % nparts) * parts:((i % nparts) + 1) * parts])
            for i in range(x.size // parts)]
    got = np.concatenate(outs)
    full = sps.fftconvolve(x, ir)
    expect = np.concatenate([np.zeros(parts, np.float32), full])[: got.size]
    np.testing.assert_allclose(got, expect, atol=5e-5 * np.max(np.abs(full)), rtol=0)


def test_tvconv_freeze2_holds_operand_buffer():
    """freeze2=False holds operand 2's buffer: subsequent h-input changes
    must not alter the output. (Note: like the reference, freezing holds
    the time-domain block — the engine still pushes it into successive ring
    slots each partition.)"""
    parts = 16
    size = parts * 2
    a = RNG.standard_normal(parts).astype(np.float32)
    h = RNG.standard_normal(parts).astype(np.float32)
    tv1 = CltvconvProcessor(parts, size)
    tv2 = CltvconvProcessor(parts, size)
    for _ in range(2):
        tv1.process(a, h)
        tv2.process(a, h)
    o1 = tv1.process(a, RNG.standard_normal(parts).astype(np.float32),
                     freeze2=False)
    o2 = tv2.process(a, h, freeze2=False)
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_tvconv_freeze1_holds_input():
    """freeze1=False holds the input operand buffer: with a frozen, fully
    loaded input ring, further input changes don't alter the output."""
    parts = 16
    size = parts * 2
    tv = CltvconvProcessor(parts, size)
    a = RNG.standard_normal(parts).astype(np.float32)
    h = RNG.standard_normal(parts).astype(np.float32)
    for _ in range(2):
        tv.process(a, h)
    out1 = tv.process(RNG.standard_normal(parts).astype(np.float32), h,
                      freeze1=False)
    tv2 = CltvconvProcessor(parts, size)
    for _ in range(2):
        tv2.process(a, h)
    out2 = tv2.process(a, h, freeze1=True)   # same effective buffered input
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_tvconv_0dbfs_scaling():
    """Inputs are divided by 0dbfs before the engine and the output is
    multiplied back (opcode.cpp:322-334): for the partitioned (linear x
    linear) product, output scales linearly with 1/0dbfs."""
    parts = 16
    a = RNG.standard_normal(parts).astype(np.float32)
    h = RNG.standard_normal(parts).astype(np.float32)
    tv1 = CltvconvProcessor(parts, parts * 2, scale=1.0)
    tv2 = CltvconvProcessor(parts, parts * 2, scale=32768.0)
    o1 = [tv1.process(a, h) for _ in range(3)][-1]
    o2 = [tv2.process(a, h) for _ in range(3)][-1]
    np.testing.assert_allclose(o2 * 32768.0, o1, rtol=1e-4, atol=1e-6)


def test_tvconv_direct_branch():
    tv = CltvconvProcessor(parts=1, size=24, block_size=16)
    assert tv.dconv
    a = RNG.standard_normal(16).astype(np.float32)
    b = RNG.standard_normal(16).astype(np.float32)
    out = tv.process(a, b)
    assert out.shape == (16,)


def test_bad_args_raise():
    with pytest.raises(ArgumentError):
        ClconvProcessor(np.ones(10, np.float32), parts=4, skip=20)
    with pytest.raises(ArgumentError):
        CltvconvProcessor(parts=8, size=12)   # not a multiple


def test_clconv_set_ir_crossfade():
    """set_ir on a live stream: the emitted stream equals the parts-delayed
    per-sample blend (1-r)*conv(x, old) + r*conv(x, new), then pure new —
    click-free IR hot-swap the reference cannot do (its push_ir swaps the
    coefficient ring instantly, cl_conv.cpp:353-388)."""
    parts, fade_blocks, swap_at = 64, 3, 4      # swap after 4 blocks
    h_old = RNG.standard_normal(parts * 3).astype(np.float32)
    h_new = RNG.standard_normal(parts * 3).astype(np.float32)
    nblocks = 12
    x = RNG.standard_normal(nblocks * parts).astype(np.float32)

    p = ClconvProcessor(h_old, parts)
    outs = []
    for i in range(nblocks):
        if i == swap_at:
            p.set_ir(h_new, fade_blocks=fade_blocks)
        outs.append(p.process(x[i * parts:(i + 1) * parts]))
    got = np.concatenate(outs)

    y_old = sps.fftconvolve(x, h_old)[: got.size]
    y_new = sps.fftconvolve(x, h_new)[: got.size]
    r = np.zeros(got.size, np.float32)          # ramp in conv-time coords
    f0, f1 = swap_at * parts, (swap_at + fade_blocks) * parts
    r[f0:f1] = (np.arange(fade_blocks * parts) + 1) / np.float32(f1 - f0)
    r[f1:] = 1.0
    blended = (1 - r) * y_old + r * y_new
    expect = np.concatenate([np.zeros(parts, np.float32), blended])[: got.size]
    tol = 3e-5 * np.max(np.abs(blended))
    np.testing.assert_allclose(got, expect, atol=tol, rtol=0)


def test_clconv_set_ir_instant_and_errors():
    parts = 64
    ir = RNG.standard_normal(parts * 2).astype(np.float32)
    p = ClconvProcessor(ir, parts)
    p.process(np.zeros(parts, np.float32))
    p.set_ir(np.zeros(parts * 2, np.float32), fade_blocks=0)   # instant swap
    out = p.process(RNG.standard_normal(parts).astype(np.float32))
    # previous block was zeros-in and the IR is now zero: silence
    np.testing.assert_array_equal(out, np.zeros(parts, np.float32))
    with pytest.raises(ArgumentError, match="exceeds"):
        p.set_ir(np.zeros(parts * 5, np.float32))
    z = ClconvProcessor(ir, parts=0, block_size=64)
    with pytest.raises(ArgumentError, match="partitioned"):
        z.set_ir(ir)
    d = ClconvProcessor(ir, parts=1, block_size=64)
    with pytest.raises(ArgumentError, match="partitioned"):
        d.set_ir(ir)
