"""Native C++ runtime tests: ring buffer, block accumulator, equivalence."""

import threading

import numpy as np
import pytest

from opencl_fft_tpu import runtime
from opencl_fft_tpu.stream import _BlockAccumulator

RNG = np.random.default_rng(77)

pytestmark = pytest.mark.skipif(not runtime.native_available(),
                                reason="native runtime not built")


def test_ringbuffer_basic():
    rb = runtime.NativeRingBuffer(100)          # rounds up to 128
    assert rb.capacity == 128
    data = RNG.standard_normal(50).astype(np.float32)
    assert rb.write(data) == 50
    assert rb.available() == 50
    out = rb.read(50)
    np.testing.assert_array_equal(out, data)
    assert rb.available() == 0


def test_ringbuffer_wraparound_and_limits():
    rb = runtime.NativeRingBuffer(64)
    a = RNG.standard_normal(48).astype(np.float32)
    rb.write(a)
    np.testing.assert_array_equal(rb.read(40), a[:40])
    b = RNG.standard_normal(50).astype(np.float32)
    assert rb.write(b) == 50                     # wraps internally
    got = rb.read(100)                           # only 58 available
    np.testing.assert_array_equal(got, np.concatenate([a[40:], b]))
    # over-fill: writes are truncated, never lost mid-sample
    big = RNG.standard_normal(100).astype(np.float32)
    wrote = rb.write(big)
    assert wrote == 64
    np.testing.assert_array_equal(rb.read(64), big[:64])


def test_ringbuffer_threaded_spsc():
    """Producer and consumer on different threads: all samples arrive in
    order (the lock-free contract)."""
    rb = runtime.NativeRingBuffer(1024)
    total = 100_000
    src = RNG.standard_normal(total).astype(np.float32)
    received = []

    def producer():
        pos = 0
        while pos < total:
            pos += rb.write(src[pos: pos + 256])

    def consumer():
        got = 0
        while got < total:
            chunk = rb.read(256)
            if chunk.size:
                received.append(chunk)
                got += chunk.size

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start(); t2.start(); t1.join(); t2.join()
    np.testing.assert_array_equal(np.concatenate(received), src)


@pytest.mark.parametrize("parts,n_streams,ks", [(64, 1, 48), (64, 2, 64),
                                                (32, 2, 100), (16, 1, 5)])
def test_native_accumulator_equals_numpy(parts, n_streams, ks):
    """The C++ accumulator and the numpy fallback implement identical
    semantics for arbitrary host block sizes."""
    nat = runtime.NativeBlockAccumulator(parts, n_streams)
    ref = _BlockAccumulator(parts, n_streams)
    calls = {"nat": [], "ref": []}

    def eng(tag):
        def run(bufin):
            calls[tag].append(np.array(bufin))
            return bufin[0] * 2.0 + 1.0
        return run

    for _ in range(7):
        blocks = RNG.standard_normal((n_streams, ks)).astype(np.float32)
        a = nat.feed(blocks, eng("nat"))
        b = ref.feed(blocks, eng("ref"))
        np.testing.assert_array_equal(a, b)
    assert len(calls["nat"]) == len(calls["ref"])
    for x, y in zip(calls["nat"], calls["ref"]):
        np.testing.assert_array_equal(x, y)


def test_accumulator_latency_contract():
    """First `parts` output samples are the initial (zero) bufout — the
    one-partition latency of opcode.cpp:240-249."""
    acc = runtime.NativeBlockAccumulator(8, 1)
    blocks = np.arange(16, dtype=np.float32)[None, :]
    out = acc.feed(blocks, lambda b: b[0])
    np.testing.assert_array_equal(out[:8], np.zeros(8))
    np.testing.assert_array_equal(out[8:], blocks[0, :8])


def test_stale_so_rebuilds(tmp_path, monkeypatch):
    """Edits to stream_rt.cpp must not be shadowed by a stale .so
    (ADVICE r1): load() rebuilds when the source is newer."""
    import os
    import shutil
    import time as _time

    src = tmp_path / "stream_rt.cpp"
    so = tmp_path / "libstream_rt.so"
    shutil.copy(runtime._SRC, src)
    monkeypatch.setattr(runtime, "_SRC", str(src))
    monkeypatch.setattr(runtime, "_SO", str(so))
    monkeypatch.setattr(runtime, "_lib", None)
    monkeypatch.setattr(runtime, "_tried", False)
    assert runtime.load() is not None          # builds fresh
    first_mtime = os.path.getmtime(so)
    monkeypatch.setattr(runtime, "_lib", None)
    monkeypatch.setattr(runtime, "_tried", False)
    _time.sleep(0.05)
    os.utime(src)                              # "edit" the source
    assert runtime.load() is not None
    assert os.path.getmtime(so) > first_mtime  # rebuilt, not shadowed
