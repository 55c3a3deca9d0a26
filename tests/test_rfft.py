"""Real FFT tests: packing convention, numpy oracle, roundtrips."""

import numpy as np
import pytest

from opencl_fft_tpu.ops import rfft

RNG = np.random.default_rng(99)
SIZES = [8, 16, 64, 256, 1024, 8192]


@pytest.mark.parametrize("n", SIZES)
def test_roundtrip(n):
    r = RNG.standard_normal((3, n)).astype(np.float32)
    packed = rfft.rfft(r)
    back = np.asarray(rfft.irfft(packed))
    np.testing.assert_allclose(back, r, atol=1e-5 * np.max(np.abs(r)), rtol=0)


@pytest.mark.parametrize("n", SIZES)
def test_matches_numpy_rfft(n):
    """packed * M mapped to standard layout == np.fft.rfft."""
    r = RNG.standard_normal((2, n)).astype(np.float32)
    m = n // 2
    packed = np.asarray(rfft.rfft(r)) * m
    std = np.asarray(rfft.packed_to_standard(packed))
    ref = np.fft.rfft(r)
    np.testing.assert_allclose(std, ref, atol=3e-5 * np.max(np.abs(ref)), rtol=0)


def test_bin0_packing():
    """bin 0 == (DC/2, Nyquist/2) — cl_fft.cpp:181."""
    n = 32
    r = RNG.standard_normal((n,)).astype(np.float32)
    packed = np.asarray(rfft.rfft(r, unnormalized=True))
    dc = r.sum()
    nyq = (r * ((-1.0) ** np.arange(n))).sum()
    np.testing.assert_allclose(packed[0].real, dc / 2, atol=1e-4)
    np.testing.assert_allclose(packed[0].imag, nyq / 2, atol=1e-4)


def test_mid_bin_is_conjugated():
    """The reference kernels never touch bin M/2, so it stores the conjugate
    of the true spectrum bin (self-consistent quirk, SURVEY §8)."""
    n = 64
    m = n // 2
    r = RNG.standard_normal((n,)).astype(np.float32)
    packed = np.asarray(rfft.rfft(r, unnormalized=True))
    true = np.fft.rfft(r)
    np.testing.assert_allclose(packed[m // 2], np.conj(true[m // 2]), atol=1e-4)


def test_standard_mapping_inverts():
    n = 128
    r = RNG.standard_normal((n,)).astype(np.float32)
    packed = np.asarray(rfft.rfft(r))
    back = np.asarray(rfft.standard_to_packed(rfft.packed_to_standard(packed)))
    np.testing.assert_allclose(back, packed, atol=1e-6)


def test_unnormalized_scale():
    n = 64
    r = RNG.standard_normal((n,)).astype(np.float32)
    a = np.asarray(rfft.rfft(r, unnormalized=True))
    b = np.asarray(rfft.rfft(r, unnormalized=False)) * (n // 2)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_sine_spectrum():
    """Port of the reference rfft smoke workload (test_rfft.cpp:54-57):
    DC + fundamental + Nyquist, checked with assertions this time."""
    n = 16
    m = n // 2
    i = np.arange(n)
    sig = (1.0 + np.cos(2 * np.pi * i / n) + np.cos(np.pi * i)).astype(np.float32)
    packed = np.asarray(rfft.rfft(sig))  # forward scaled by 1/M
    # DC/2 packed into bin0.re: DC = sum = 16 -> /M = 2 -> /2 = 1
    np.testing.assert_allclose(packed[0].real, 1.0, atol=1e-5)
    # Nyquist/2 in bin0.im: sum((-1)^n sig) = 16 -> /M=2 -> /2 = 1
    np.testing.assert_allclose(packed[0].imag, 1.0, atol=1e-5)
    # fundamental: bin1 = N/2 * amp/... rfft of cos = N/2 at bin1 -> /M = 1
    np.testing.assert_allclose(packed[1], 1.0 + 0j, atol=1e-5)
    # remaining bins empty
    rest = np.delete(packed, [0, 1])
    assert np.max(np.abs(rest)) < 1e-5


def test_interleave_roundtrip():
    r = RNG.standard_normal((5, 32)).astype(np.float32)
    z = rfft.deinterleave(r)
    back = np.asarray(rfft.interleave(z))
    np.testing.assert_array_equal(back, r)


def test_odd_or_tiny_sizes_raise():
    with pytest.raises(ValueError):
        rfft.rfft(np.zeros(2, np.float32))


@pytest.mark.parametrize("n", [6, 10, 18, 22])
def test_odd_half_length_raises(n):
    """Even sizes with an odd complex-bin count (n % 4 == 2) have no
    self-conjugate bin M/2, so the packed convention silently breaks —
    they must be rejected, not accepted (ADVICE r1, medium)."""
    with pytest.raises(ValueError):
        rfft.rfft(np.zeros(n, np.float32))


@pytest.mark.parametrize("n", [12, 24, 48, 96])
def test_nonpow2_multiple_of_4_roundtrips(n):
    """Beyond-parity sizes (Bluestein core) still satisfy the packed
    convention as long as M = n/2 is even."""
    r = RNG.standard_normal((2, n)).astype(np.float32)
    back = np.asarray(rfft.irfft(rfft.rfft(r)))
    np.testing.assert_allclose(back, r, atol=1e-4 * np.max(np.abs(r)), rtol=0)
    m = n // 2
    std = np.asarray(rfft.packed_to_standard(np.asarray(rfft.rfft(r)) * m))
    np.testing.assert_allclose(std, np.fft.rfft(r),
                               atol=1e-4 * n, rtol=0)
