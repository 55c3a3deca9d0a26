"""End-to-end real-time pipeline: audio thread <-> rings <-> device worker.

The reference's opcode layer runs inside Csound's real-time engine
(opcode.cpp:229-252); these tests drive the rebuild's equivalent — a
paced duplex audio loop against the worker thread — asserting zero
underruns at a comfortable operating point and bit-level agreement with
the offline render (modulo the priming latency)."""

import time

import numpy as np
import pytest

from opencl_fft_tpu import runtime
from opencl_fft_tpu.ops import pconv as P

if not runtime.native_available():          # pragma: no cover
    pytest.skip("native runtime unavailable", allow_module_level=True)

from opencl_fft_tpu.runtime.pipeline import RealtimePipeline

RNG = np.random.default_rng(11)


def _paced_duplex(pipe, blocks, sr, extra_pulls=0):
    """Simulated sound card: every block/sr seconds push one input block
    and pull one output block (duplex callback)."""
    pts = pipe.block                 # _PipelineBase attr, both pipelines
    period = pts / sr
    outs = []
    nxt = time.monotonic()
    seq = list(blocks) + [None] * extra_pulls
    for blk in seq:
        nxt += period
        while time.monotonic() < nxt:
            time.sleep(period / 50)
        if blk is not None:
            if getattr(pipe, "tv", False):
                pipe.push(blk[0], blk[1])
            else:
                pipe.push(blk)
        outs.append(pipe.pull(pts))
    return np.concatenate(outs)


def test_lti_pipeline_matches_offline_zero_underruns():
    pts, nparts, prime = 128, 8, 2
    sr = 8000.0                      # 16 ms budget/block >> CPU step time
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    ir = RNG.standard_normal(cfg.cvs).astype(np.float32) * 0.1
    nblocks = 40
    blocks = RNG.standard_normal((nblocks, pts)).astype(np.float32)

    # offline oracle = the same jitted per-step program (bitwise identical;
    # the scan-based pconv_stream fuses differently -> ~4e-6 f32 noise)
    import jax
    from functools import partial
    step = jax.jit(partial(P.pconv_step, cfg))
    st = P.push_ir(cfg, P.pconv_init(cfg), ir)
    outs = []
    for b in blocks:
        st, o = step(st, b)
        outs.append(np.asarray(o))
    offline = np.concatenate(outs)

    with RealtimePipeline(cfg, ir=ir, prime_blocks=prime) as pipe:
        pipe.push(blocks[0])         # warm the jit outside the paced loop
        pipe.wait_for_blocks(1)
        # paced pulls: prime zero-blocks + all nblocks outputs
        got = _paced_duplex(pipe, blocks[1:], sr, extra_pulls=prime + 1)

    assert pipe.underrun_samples == 0
    assert pipe.overrun_samples == 0
    assert pipe.blocks_processed == nblocks
    # stream = prime zeros, then the offline render, sample-exact
    np.testing.assert_array_equal(got[: prime * pts], np.zeros(prime * pts))
    np.testing.assert_array_equal(got[prime * pts:], offline)


def test_tv_pipeline_matches_offline():
    pts, nparts, prime = 64, 4, 2
    sr = 8000.0
    cfg = P.PconvConfig.for_ir_length(pts * nparts, pts)
    nblocks = 24
    bx = RNG.standard_normal((nblocks, pts)).astype(np.float32)
    bh = RNG.standard_normal((nblocks, pts)).astype(np.float32)

    import jax
    from functools import partial
    step = jax.jit(partial(P.pconv_step_tv, cfg))
    st = P.pconv_init(cfg)
    outs = []
    for i in range(nblocks):
        st, o = step(st, bx[i], bh[i])
        outs.append(np.asarray(o))
    offline = np.concatenate(outs)

    with RealtimePipeline(cfg, tv=True, prime_blocks=prime) as pipe:
        pipe.push(bx[0], bh[0])      # warm the jit outside the paced loop
        pipe.wait_for_blocks(1)
        got = _paced_duplex(pipe, list(zip(bx[1:], bh[1:])), sr,
                            extra_pulls=prime + 1)
    assert pipe.underrun_samples == 0
    assert pipe.blocks_processed == nblocks
    np.testing.assert_array_equal(got[: prime * pts], np.zeros(prime * pts))
    np.testing.assert_array_equal(got[prime * pts:], offline)


def test_processor_pipeline_zero_latency_stream():
    """ProcessorPipeline wraps the opcode-layer surface: the parts=0
    (zero-added-latency) processor behind the native rings emits the
    offline convolution offset ONLY by the priming budget — no
    algorithmic partition latency anywhere in the chain."""
    from scipy import signal as sps

    from opencl_fft_tpu.runtime.pipeline import ProcessorPipeline
    from opencl_fft_tpu.stream import ClconvProcessor

    bs, prime, sr = 64, 2, 1500.0   # ~43 ms/block >> the ~7 ms CPU step
    ir = RNG.standard_normal(500).astype(np.float32) * 0.1
    nblocks = 24
    blocks = RNG.standard_normal((nblocks, bs)).astype(np.float32)
    proc = ClconvProcessor(ir, parts=0, block_size=bs)
    assert proc.latency == 0

    pipe = ProcessorPipeline(proc, bs, prime_blocks=prime)
    with pipe:
        pipe.push(blocks[0])                    # warm the jit
        pipe.wait_for_blocks(1)
        got = _paced_duplex(pipe, blocks[1:], sr, extra_pulls=prime + 1)

    assert pipe.underrun_samples == 0
    assert pipe.blocks_processed == nblocks
    np.testing.assert_array_equal(got[: prime * bs], np.zeros(prime * bs))
    ref = sps.fftconvolve(blocks.reshape(-1), ir)[: nblocks * bs]
    np.testing.assert_allclose(got[prime * bs: prime * bs + ref.size], ref,
                               atol=3e-5 * np.max(np.abs(ref)), rtol=0)


def test_processor_pipeline_rejects_block_size_mismatch():
    """Fixed-block processors (direct / zero-latency engines) must be
    rejected at construction, not die later inside the worker thread."""
    from opencl_fft_tpu.runtime.pipeline import ProcessorPipeline
    from opencl_fft_tpu.stream import ClconvProcessor

    ir = RNG.standard_normal(256).astype(np.float32)
    proc = ClconvProcessor(ir, parts=0, block_size=64)
    with pytest.raises(ValueError, match="fixed at 64"):
        ProcessorPipeline(proc, 128)


def test_worker_death_is_surfaced_not_silent():
    """A processor that raises must not silently deadlock the pipeline:
    the error re-raises from wait_for_blocks / push / pull / __exit__."""
    from opencl_fft_tpu.runtime.pipeline import ProcessorPipeline

    class Broken:
        def process(self, block):
            raise RuntimeError("engine exploded")

    pipe = ProcessorPipeline(Broken(), 64, prime_blocks=1).start()
    pipe.push(np.zeros(64, np.float32))
    with pytest.raises(RuntimeError, match="worker died"):
        pipe.wait_for_blocks(1, timeout=5.0)
    with pytest.raises(RuntimeError, match="worker died"):
        pipe.push(np.zeros(64, np.float32))
    with pytest.raises(RuntimeError, match="worker died"):
        pipe.pull(64)
    pipe.stop()
    # context exit surfaces it too (when no other exception is in flight)
    pipe2 = ProcessorPipeline(Broken(), 64, prime_blocks=1)
    with pytest.raises(RuntimeError, match="worker died"):
        with pipe2:
            pipe2._in_x.write(np.zeros(64, np.float32))  # ring op only:
            # bypass push()'s own check so __exit__ does the surfacing
            deadline = time.monotonic() + 5.0
            while pipe2.error is None and time.monotonic() < deadline:
                time.sleep(1e-3)


def test_wait_for_blocks_times_out():
    from opencl_fft_tpu.runtime.pipeline import ProcessorPipeline

    class Idle:
        def process(self, block):    # pragma: no cover — never fed
            return block

    pipe = ProcessorPipeline(Idle(), 64).start()
    with pytest.raises(TimeoutError):
        pipe.wait_for_blocks(1, timeout=0.05)
    pipe.stop()


def test_overrun_and_underrun_are_counted():
    cfg = P.PconvConfig.for_ir_length(64 * 4, 64)
    pipe = RealtimePipeline(cfg, ir=np.zeros(cfg.cvs, np.float32),
                            prime_blocks=1, capacity_blocks=2)
    # worker not started: pushes beyond ring capacity are overruns
    big = np.zeros(64 * 8, np.float32)
    pipe.push(big)
    assert pipe.overrun_samples == 64 * 8 - 64 * 2
    # only the priming block is available: pulling more underruns
    out = pipe.pull(64 * 3)
    assert out.size == 64 * 3
    assert pipe.underrun_samples == 64 * 2
