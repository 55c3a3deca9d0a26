"""Batched engine "models" — the deployment-shaped surfaces.

Convolver    — batched LTI convolution (clconv at scale)
TVConvolver  — batched time-varying convolution (cltvconv at scale; flagship)
BatchedFFT   — batched transforms (clfft/clrfft at scale)
ZeroLatencyConvolver — non-uniform (Gardner) partitioning: streamed
                       output == offline convolution with NO added
                       latency (beyond-parity; the reference always
                       pays one partition)
"""

from .convolver import BatchedFFT, Convolver, TVConvolver, batched_state
from .lowlatency import Segment, ZeroLatencyConvolver, plan_segments

__all__ = ["BatchedFFT", "Convolver", "TVConvolver", "batched_state",
           "Segment", "ZeroLatencyConvolver", "plan_segments"]
