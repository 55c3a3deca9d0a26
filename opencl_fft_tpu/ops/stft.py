"""Short-time Fourier transform on the framework's FFT core.

Beyond-parity capability: the reference exposes raw k-rate FFTs
(`clfft`/`clrfft`) and leaves framing to the host program. This module
provides the batched framing/windowing/overlap-add layer those opcodes are
typically used to build — spectral processing (analysis, masking,
cross-synthesis, fast convolution variants) as jit-first array ops.

Conventions: standard unnormalized analysis (matches scipy.signal.stft up
to its scaling options when using the same window/hop), synthesis via
windowed overlap-add with the usual COLA normalization.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Cplx
from .fft import fft_split
from ..utils.numerics import is_pow2

Float = jax.Array


@functools.lru_cache(maxsize=None)
def hann_np(n: int) -> np.ndarray:
    """Periodic Hann window (COLA at hop n/2, n/4, ...)."""
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def frame(x: Float, nfft: int, hop: int) -> Float:
    """(..., T) -> (..., nframes, nfft) sliding frames (zero-padded tail)."""
    x = jnp.asarray(x, jnp.float32)
    t = x.shape[-1]
    nframes = max(1, -(-(t - nfft) // hop) + 1) if t >= nfft else 1
    need = (nframes - 1) * hop + nfft
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - t)])
    idx = jnp.arange(nframes)[:, None] * hop + jnp.arange(nfft)[None, :]
    return jnp.take(x, idx, axis=-1)


def stft(x: Float, nfft: int = 1024, hop: Optional[int] = None,
         window: Optional[np.ndarray] = None, impl: str = "auto") -> Cplx:
    """Real-input STFT -> split complex (..., nframes, nfft//2+1).

    Full-size complex FFT per frame (not the packed half-size trick) so the
    spectrum layout is the standard rfft one — this is the interop-friendly
    surface; the convolution engines use the packed layout internally.
    """
    if not is_pow2(nfft):
        raise ValueError(f"nfft must be a power of two, got {nfft}")
    hop = hop or nfft // 2
    win = jnp.asarray(window if window is not None else hann_np(nfft))
    frames = frame(x, nfft, hop) * win
    re, im = fft_split((frames, jnp.zeros_like(frames)), -1, impl)
    keep = nfft // 2 + 1
    return re[..., :keep], im[..., :keep]


def istft(spec: Cplx, nfft: int = 1024, hop: Optional[int] = None,
          window: Optional[np.ndarray] = None, length: Optional[int] = None,
          impl: str = "auto") -> Float:
    """Inverse STFT via windowed overlap-add with COLA normalization."""
    hop = hop or nfft // 2
    win = jnp.asarray(window if window is not None else hann_np(nfft))
    re, im = spec
    # rebuild the full hermitian spectrum from the half layout
    tail_r = jnp.flip(re[..., 1:-1], axis=-1)
    tail_i = -jnp.flip(im[..., 1:-1], axis=-1)
    fr = jnp.concatenate([re, tail_r], axis=-1)
    fi = jnp.concatenate([im, tail_i], axis=-1)
    yr, _ = fft_split((fr, fi), +1, impl)
    frames = yr / nfft * win                       # windowed synthesis
    nframes = frames.shape[-2]
    total = (nframes - 1) * hop + nfft
    idx = jnp.arange(nframes)[:, None] * hop + jnp.arange(nfft)[None, :]
    out = jnp.zeros(frames.shape[:-2] + (total,), jnp.float32)
    out = out.at[..., idx].add(frames)
    # COLA normalization: sum of squared windows at each sample
    wsum = jnp.zeros((total,), jnp.float32).at[idx].add(win * win)
    out = out / jnp.maximum(wsum, 1e-8)
    if length is not None:
        out = out[..., :length]
    return out


def spectrogram(x: Float, nfft: int = 1024, hop: Optional[int] = None,
                impl: str = "auto") -> Float:
    """Power spectrogram |STFT|^2 (..., nframes, nfft//2+1)."""
    re, im = stft(x, nfft, hop, impl=impl)
    return re * re + im * im
