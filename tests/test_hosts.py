"""Audio-host binding: a PortAudio-convention callback driving the
pipeline from a paced host, end-to-end over a multi-second run.

The reference's L3 runs inside a real audio engine (csound/opcode.cpp:
347-352); runtime/hosts.py is the rebuild's host boundary. These tests
drive the SAME callback object a sounddevice.Stream would call, from
the wall-clock-paced VirtualHost (no audio hardware in CI), and assert
the real-time health metrics: zero underruns at a comfortable operating
point, correct output (offline render delayed by the priming), and a
loud failure when the callback dies.
"""

import numpy as np
import pytest

from opencl_fft_tpu import runtime
from opencl_fft_tpu.ops import pconv as P

if not runtime.native_available():          # pragma: no cover
    pytest.skip("native runtime unavailable", allow_module_level=True)

from opencl_fft_tpu.runtime.hosts import (PipelineCallback, VirtualHost,
                                          open_host)
from opencl_fft_tpu.runtime.pipeline import RealtimePipeline

RNG = np.random.default_rng(23)


def test_virtual_host_multisecond_no_underruns():
    """~2 s paced duplex run at sr=8000 (16 ms/block budget >> CPU step
    time): zero underruns and the output equals the offline render
    shifted by the priming."""
    pts, nparts, prime = 128, 8, 2
    sr = 8000
    seconds = 2.0
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    ir = RNG.standard_normal(cfg.cvs).astype(np.float32) * 0.1
    sig = RNG.standard_normal(int(sr * seconds)).astype(np.float32) * 0.3

    pos = [0]

    def source(n):
        s = np.zeros(n, np.float32)
        take = min(n, sig.size - pos[0])
        if take > 0:
            s[:take] = sig[pos[0]:pos[0] + take]
            pos[0] += take
        return s

    with RealtimePipeline(cfg, ir=ir, prime_blocks=prime,
                          capacity_blocks=16) as pipe:
        pipe.push(np.zeros(pts, np.float32))
        pipe.wait_for_blocks(1, timeout=60)   # jit warm-up off the clock
        cb = PipelineCallback(pipe)
        host = VirtualHost(cb, sr=sr, frames=pts, source=source)
        nframes = int(sr * seconds) // pts
        with host:
            import time
            while len(host.captured) < nframes:
                time.sleep(0.01)
        assert pipe.underrun_samples == 0
        assert pipe.overrun_samples == 0
        assert cb.callbacks >= nframes

    # correctness: captured stream == offline render delayed by
    # (prime + 1 warm-up) blocks; compare a mid-stream window
    out = host.output()
    st = P.push_ir(cfg, P.pconv_init(cfg), ir)
    blocks = sig[: nframes * pts].reshape(-1, pts)
    _, ref = P.pconv_stream(cfg, st, blocks)
    ref = np.asarray(ref).reshape(-1)
    delay = (prime + 1) * pts
    n = min(out.size - delay, ref.size - pts)
    assert n > sr          # at least a second of overlap compared
    np.testing.assert_allclose(out[delay:delay + n], ref[:n], atol=1e-5)


def test_virtual_host_counts_underruns_when_starved():
    """A pipeline fed nothing must emit silence and count underruns —
    the metric a sound card would report as audible dropouts."""
    pts = 128
    cfg = P.PconvConfig.for_ir_length(pts * 4, pts)
    ir = RNG.standard_normal(cfg.cvs).astype(np.float32) * 0.1
    with RealtimePipeline(cfg, ir=ir, prime_blocks=1) as pipe:
        cb = PipelineCallback(pipe)
        # no source: pushes silence; but pull 3 blocks immediately with
        # the worker never having produced (cold jit) -> underruns after
        # the 1-block priming drains
        out = np.zeros((pts, 1), np.float32)
        for _ in range(3):
            cb(np.zeros((pts, 1), np.float32), out, pts, {}, 0)
        assert pipe.underrun_samples > 0


def test_virtual_host_surfaces_callback_error():
    def boom(indata, outdata, frames, time_info, status):
        raise RuntimeError("cable unplugged")

    host = VirtualHost(boom, sr=8000, frames=64)
    with pytest.raises(RuntimeError, match="cable unplugged"):
        with host:
            import time
            time.sleep(0.1)


def test_open_host_falls_back_to_virtual():
    """Without the sounddevice package, auto picks the virtual host;
    an explicit sounddevice request fails loudly."""
    cb = PipelineCallback.__new__(PipelineCallback)  # contract only
    host = open_host(cb, sr=8000, frames=64)
    try:
        import sounddevice  # noqa: F401
        from opencl_fft_tpu.runtime.hosts import SoundDeviceHost
        assert isinstance(host, SoundDeviceHost)
    except ImportError:
        assert isinstance(host, VirtualHost)
        with pytest.raises(RuntimeError, match="sounddevice"):
            open_host(cb, prefer="sounddevice")
