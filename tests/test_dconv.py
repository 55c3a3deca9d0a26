"""Direct-convolution tests: numpy oracle + reference-model parity."""

import numpy as np
import pytest

from opencl_fft_tpu.ops import dconv
from opencl_fft_tpu.ops.dconv import (DconvConfig, dconv_init, dconv_step,
                                      dconv_step_tv, push_ir)

from reference_model import RefDconv

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("irsize,vsize", [(8, 4), (63, 32), (512, 64), (100, 128)])
def test_exact_matches_numpy(irsize, vsize):
    x = RNG.standard_normal(1000).astype(np.float32)
    h = RNG.standard_normal(irsize).astype(np.float32)
    got = np.asarray(dconv.convolve_direct(x, h, vsize=vsize))
    ref = np.convolve(x, h)
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.max(np.abs(ref)), rtol=0)


@pytest.mark.parametrize("irsize,vsize", [(8, 4), (17, 16), (64, 32)])
def test_compat_matches_reference_model(irsize, vsize):
    """delay_compat=True reproduces the reference's one-sample-late taps
    (cl_dconv.cpp:41) across many ring wrap-arounds."""
    cfg = DconvConfig(irsize=irsize, vsize=vsize, delay_compat=True)
    h = RNG.standard_normal(irsize).astype(np.float32)
    st = push_ir(cfg, dconv_init(cfg), h)
    ref = RefDconv(irsize, vsize)
    ref.push_ir(h.astype(np.float64))
    for _ in range(10):
        blk = RNG.standard_normal(vsize).astype(np.float32)
        st, out = dconv_step(cfg, st, blk)
        expect = ref.convolution(blk.astype(np.float64))
        np.testing.assert_allclose(np.asarray(out), expect,
                                   atol=1e-4 * (np.max(np.abs(expect)) + 1), rtol=0)


@pytest.mark.parametrize("irsize,vsize", [(8, 4), (48, 16)])
def test_tv_matches_reference_model(irsize, vsize):
    """Time-varying path: coefficients stream into the ring at the same
    positions as the delay line (cl_dconv.cpp:134-148)."""
    cfg = DconvConfig(irsize=irsize, vsize=vsize, delay_compat=True)
    st = dconv_init(cfg)
    ref = RefDconv(irsize, vsize)
    for _ in range(12):
        b1 = RNG.standard_normal(vsize).astype(np.float32)
        b2 = RNG.standard_normal(vsize).astype(np.float32)
        st, out = dconv_step_tv(cfg, st, b1, b2)
        expect = ref.convolution_tv(b1.astype(np.float64), b2.astype(np.float64))
        np.testing.assert_allclose(np.asarray(out), expect,
                                   atol=1e-4 * (np.max(np.abs(expect)) + 1), rtol=0)


def test_exact_is_one_sample_earlier_than_compat():
    irsize, vsize = 16, 8
    h = RNG.standard_normal(irsize).astype(np.float32)
    x = RNG.standard_normal(64).astype(np.float32)
    outs = {}
    for compat in (False, True):
        cfg = DconvConfig(irsize=irsize, vsize=vsize, delay_compat=compat)
        st = push_ir(cfg, dconv_init(cfg), h)
        blocks = x.reshape(-1, vsize)
        acc = []
        for b in blocks:
            st, o = dconv_step(cfg, st, b)
            acc.append(np.asarray(o))
        outs[compat] = np.concatenate(acc)
    np.testing.assert_allclose(outs[True][1:], outs[False][:-1], atol=1e-5)


def test_identity_ir():
    cfg = DconvConfig(irsize=4, vsize=8)
    h = np.array([1, 0, 0, 0], np.float32)
    st = push_ir(cfg, dconv_init(cfg), h)
    blk = RNG.standard_normal(8).astype(np.float32)
    _, out = dconv_step(cfg, st, blk)
    np.testing.assert_allclose(np.asarray(out), blk, atol=1e-6)


def test_validation():
    with pytest.raises(ValueError):
        DconvConfig(irsize=0, vsize=4)
    cfg = DconvConfig(irsize=4, vsize=4)
    with pytest.raises(ValueError):
        push_ir(cfg, dconv_init(cfg), np.zeros(5, np.float32))
