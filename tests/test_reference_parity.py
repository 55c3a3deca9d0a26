"""Asserting ports of the reference's smoke tests.

The reference's test_cfft.cpp / test_rfft.cpp run a forward+inverse
roundtrip at N=16 and PRINT the arrays for eyeball verification (no
assertions — SURVEY §4). These are the same workloads with the 1e-5
tolerance bar from BASELINE.json enforced.
"""

import numpy as np

from opencl_fft_tpu.api import Clcfft, Clrfft

N = 16


def test_cfft_port():
    """test_cfft.cpp:22-84: complex sine through forward then inverse."""
    i = np.arange(N)
    sig = (np.cos(2 * np.pi * i / N) + 1j * np.sin(2 * np.pi * i / N)).astype(
        np.complex64
    )
    fwd = Clcfft(0, N, True)
    inv = Clcfft(0, N, False)

    spec = sig.copy()
    fwd.transform(spec)
    # complex exponential e^{2*pi*i*n/N}: all energy in bin 1; forward
    # scaling 1/N makes it exactly 1.0 (cl_fft.cpp:39-40)
    expect = np.zeros(N, np.complex64)
    expect[1] = 1.0
    np.testing.assert_allclose(spec, expect, atol=1e-5)

    out = spec.copy()
    inv.transform(out)
    np.testing.assert_allclose(out, sig, atol=1e-5)


def test_rfft_port():
    """test_rfft.cpp:21-85: DC + fundamental + Nyquist real signal."""
    i = np.arange(N)
    sig = (1.0 + np.cos(2 * np.pi * i / N) + np.cos(np.pi * i)).astype(np.float32)
    fwd = Clrfft(0, N, True)
    inv = Clrfft(0, N, False)

    spec = np.zeros(N // 2, np.complex64)
    fwd.transform(spec, sig.copy())
    # packed bin0 = (DC, Nyq) halves after 1/M scaling: DC=16/8/2=1, Nyq same
    np.testing.assert_allclose(spec[0], 1.0 + 1.0j, atol=1e-5)
    np.testing.assert_allclose(spec[1], 1.0 + 0.0j, atol=1e-5)
    np.testing.assert_allclose(spec[2:], 0.0, atol=1e-5)

    out = np.zeros(N, np.float32)
    inv.transform(spec, out)
    np.testing.assert_allclose(out, sig, atol=1e-5)


def test_cfft_port_large():
    """Same roundtrip at the BASELINE.json config size (N=1024)."""
    n = 1024
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    fwd = Clcfft(0, n, True)
    inv = Clcfft(0, n, False)
    data = sig.copy()
    fwd.transform(data)
    inv.transform(data)
    np.testing.assert_allclose(data, sig, atol=1e-5 * np.max(np.abs(sig)))


def test_rfft_port_sizes():
    """BASELINE.json: rfft roundtrip across N = 2^10 .. 2^16."""
    rng = np.random.default_rng(1)
    for n in [1 << 10, 1 << 13, 1 << 16]:
        sig = rng.standard_normal(n).astype(np.float32)
        fwd = Clrfft(0, n, True)
        inv = Clrfft(0, n, False)
        spec = np.zeros(n // 2, np.complex64)
        fwd.transform(spec, sig.copy())
        out = np.zeros(n, np.float32)
        inv.transform(spec, out)
        np.testing.assert_allclose(out, sig, atol=1e-5 * np.max(np.abs(sig)))
