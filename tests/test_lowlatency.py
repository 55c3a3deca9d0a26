"""Zero-added-latency (non-uniform partitioned) convolution.

Beyond-parity capability (models/lowlatency.py): the streamed output
must equal offline ``scipy.signal.fftconvolve`` with NO added latency —
the property the reference's opcode layer explicitly cannot provide
(one-partition delay, csound/opcode.cpp:240-249). Oracle: scipy, like
the rest of the convolution suite (SURVEY §4).
"""

import numpy as np
import pytest
from scipy import signal as sps

from opencl_fft_tpu.models import ZeroLatencyConvolver, plan_segments

RNG = np.random.default_rng(11)


def test_plan_invariants():
    """Segments tile [block, >=L) contiguously; every consumption delay
    is a positive integer number of engine blocks (offset % pts == 0)."""
    for L, B, pmax in [(5000, 64, 256), (100000, 64, 1024), (65, 64, 128),
                       (4096, 128, 128), (3, 64, 64)]:
        segs = plan_segments(L, B, pmax)
        cover = B
        for s in segs:
            assert s.offset == cover
            assert s.offset % s.pts == 0
            assert s.delay == s.offset // s.pts >= 1
            assert s.pts <= pmax
            cover += s.length
        assert cover >= L
        # doubling phase: offset == pts (the latency-hiding identity)
        for s in segs[:-1]:
            assert s.offset == s.pts and s.nparts == 1 and s.delay == 1


def test_plan_rejects_bad_shapes():
    with pytest.raises(ValueError):
        plan_segments(1000, 100)            # non-pow2 block
    with pytest.raises(ValueError):
        plan_segments(1000, 64, pmax=32)    # pmax < block


@pytest.mark.parametrize("L,B,pmax", [
    (5000, 64, 256),     # doubling + terminal
    (5000, 64, 128),     # short doubling phase, 39-partition terminal
    (9000, 64, 64),      # no doubling: uniform tail straight away
    (1000, 64, 1024),    # doubling only
    (300, 128, 1024),    # two segments
    (64, 64, 1024),      # head only
    (65, 64, 128),       # head + one partial segment
])
def test_render_matches_scipy(L, B, pmax):
    ir = RNG.standard_normal(L).astype(np.float32)
    x = RNG.standard_normal(3 * L // 2 + 257).astype(np.float32)
    zl = ZeroLatencyConvolver(ir, block=B, pmax=pmax)
    y = zl.render(x)
    ref = sps.fftconvolve(x, ir)
    assert y.shape == ref.shape
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(y, ref, atol=2e-5 * scale, rtol=0)


def test_streaming_is_zero_latency():
    """process() must emit y[tB:(t+1)B] at step t — block t of the TRUE
    convolution, including the within-block (tap < B) contributions a
    one-partition-latency engine cannot produce."""
    ir = RNG.standard_normal(700).astype(np.float32)
    x = RNG.standard_normal(640).astype(np.float32)
    zl = ZeroLatencyConvolver(ir, block=64, pmax=128)
    ref = sps.fftconvolve(x, ir)
    scale = np.max(np.abs(ref))
    for t in range(10):
        out = zl.process(x[64 * t: 64 * (t + 1)])
        np.testing.assert_allclose(out, ref[64 * t: 64 * (t + 1)],
                                   atol=2e-5 * scale, rtol=0)


def test_impulse_passthrough_is_immediate():
    """A unit impulse IR makes the convolver an identity with zero
    delay — the sharpest form of the latency claim."""
    ir = np.zeros(500, np.float32)
    ir[0] = 1.0
    zl = ZeroLatencyConvolver(ir, block=64, pmax=128)
    x = RNG.standard_normal(64).astype(np.float32)
    out = zl.process(x)
    np.testing.assert_allclose(out, x, atol=1e-5, rtol=0)


def test_state_is_pytree_and_deterministic():
    import jax

    ir = RNG.standard_normal(900).astype(np.float32)
    x = RNG.standard_normal(64).astype(np.float32)
    a = ZeroLatencyConvolver(ir, block=64, pmax=256)
    b = ZeroLatencyConvolver(ir, block=64, pmax=256)
    leaves, treedef = jax.tree.flatten(a.state)
    a.state = jax.tree.unflatten(treedef, leaves)    # roundtrips
    ya = np.concatenate([a.process(x) for _ in range(6)])
    yb = np.concatenate([b.process(x) for _ in range(6)])
    assert np.array_equal(ya, yb)                    # bitwise rerun


def test_checkpoint_resume_bit_exact(tmp_path):
    """ZLState is one pytree: save mid-stream, restore into a fresh
    convolver, and the continuation is bit-identical (SURVEY §5.4)."""
    from opencl_fft_tpu.utils.checkpoint import load_state, save_state

    ir = RNG.standard_normal(900).astype(np.float32)
    blocks = RNG.standard_normal((12, 64)).astype(np.float32)
    a = ZeroLatencyConvolver(ir, block=64, pmax=256)
    for b in blocks[:5]:
        a.process(b)
    path = str(tmp_path / "zl.npz")
    save_state(path, a.state)
    rest = np.stack([a.process(b) for b in blocks[5:]])

    b2 = ZeroLatencyConvolver(ir, block=64, pmax=256)
    b2.state = load_state(path, b2.state)
    resumed = np.stack([b2.process(b) for b in blocks[5:]])
    assert np.array_equal(rest, resumed)


def test_reset_restores_initial_output():
    ir = RNG.standard_normal(600).astype(np.float32)
    x = RNG.standard_normal(64).astype(np.float32)
    zl = ZeroLatencyConvolver(ir, block=64, pmax=128)
    first = zl.process(x)
    for _ in range(5):
        zl.process(x)
    zl.reset()
    again = zl.process(x)
    assert np.array_equal(first, again)


def test_process_rejects_wrong_block():
    zl = ZeroLatencyConvolver(np.ones(100, np.float32), block=64)
    with pytest.raises(ValueError):
        zl.process(np.zeros(32, np.float32))
