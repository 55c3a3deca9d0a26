"""Batched engine "models" — the deployment-shaped surfaces.

Convolver    — batched LTI convolution (clconv at scale)
TVConvolver  — batched time-varying convolution (cltvconv at scale; flagship)
BatchedFFT   — batched transforms (clfft/clrfft at scale)
"""

from .convolver import BatchedFFT, Convolver, TVConvolver, batched_state

__all__ = ["BatchedFFT", "Convolver", "TVConvolver", "batched_state"]
