"""STFT layer tests: roundtrip, scipy cross-check, framing."""

import numpy as np
import pytest

from opencl_fft_tpu.ops import stft as S

RNG = np.random.default_rng(61)


def test_frame_shapes_and_content():
    x = np.arange(10, dtype=np.float32)
    f = np.asarray(S.frame(x, nfft=4, hop=2))
    assert f.shape == (4, 4)
    np.testing.assert_array_equal(f[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(f[1], [2, 3, 4, 5])
    np.testing.assert_array_equal(f[3], [6, 7, 8, 9])


@pytest.mark.parametrize("nfft,hop", [(256, 128), (512, 128), (1024, 256)])
def test_roundtrip(nfft, hop):
    x = RNG.standard_normal(8192).astype(np.float32)
    spec = S.stft(x, nfft, hop)
    y = np.asarray(S.istft(spec, nfft, hop, length=8192))
    # edges lose energy below COLA coverage; compare the interior
    lo, hi = nfft, 8192 - nfft
    np.testing.assert_allclose(y[lo:hi], x[lo:hi],
                               atol=1e-4 * np.max(np.abs(x)), rtol=0)


def test_matches_scipy_magnitudes():
    from scipy import signal as sps
    x = RNG.standard_normal(4096).astype(np.float32)
    nfft, hop = 512, 256
    re, im = S.stft(x, nfft, hop)
    ours = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)
    _, _, Z = sps.stft(x, nperseg=nfft, noverlap=nfft - hop,
                       window="hann", boundary=None, padded=True)
    theirs = np.abs(Z).T * (S.hann_np(nfft).sum())       # undo scipy's 1/win.sum()
    n = min(ours.shape[0], theirs.shape[0])
    np.testing.assert_allclose(ours[:n], theirs[:n],
                               atol=2e-3 * theirs.max(), rtol=0)


def test_spectrogram_peak():
    sr, nfft = 8192, 1024
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1024 * t).astype(np.float32)  # bin 128 at nfft=1024
    p = np.asarray(S.spectrogram(x, nfft, nfft // 2))
    assert (np.argmax(p, axis=-1) == 128).all()


def test_batched():
    x = RNG.standard_normal((3, 4096)).astype(np.float32)
    re, im = S.stft(x, 512, 256)
    assert re.shape[0] == 3 and re.shape[-1] == 257
