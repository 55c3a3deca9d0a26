"""Native host-runtime bindings (ctypes over runtime/stream_rt.cpp).

Provides:
  * ``NativeBlockAccumulator`` — C++ partition accumulator with the opcode
    layer's one-partition-latency semantics (opcode.cpp:240-249).
  * ``NativeRingBuffer`` — lock-free SPSC float ring for decoupling
    real-time producers from the device worker.
  * ``native_available()`` / ``load()`` — the .so is built on demand with
    g++; all users fall back to pure-numpy implementations when native
    code can't be built, so the framework never hard-requires a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "stream_rt.cpp")
_SO = os.path.join(_HERE, "libstream_rt.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _stale() -> bool:
    try:
        return os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    except OSError:
        return True


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable.

    Rebuilds whenever the C++ source is newer than the shared object, so
    source edits (or a binary from another machine/ABI) are never silently
    shadowed by a stale .so; the numpy fallback covers toolchain-less hosts.
    """
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not os.path.exists(_SO) or _stale()) and not _build():
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.rb_new.restype = ctypes.c_void_p
    lib.rb_new.argtypes = [ctypes.c_size_t]
    lib.rb_free.argtypes = [ctypes.c_void_p]
    lib.rb_capacity.restype = ctypes.c_size_t
    lib.rb_capacity.argtypes = [ctypes.c_void_p]
    lib.rb_available.restype = ctypes.c_size_t
    lib.rb_available.argtypes = [ctypes.c_void_p]
    lib.rb_space.restype = ctypes.c_size_t
    lib.rb_space.argtypes = [ctypes.c_void_p]
    lib.rb_write.restype = ctypes.c_size_t
    lib.rb_write.argtypes = [ctypes.c_void_p, fp, ctypes.c_size_t]
    lib.rb_read.restype = ctypes.c_size_t
    lib.rb_read.argtypes = [ctypes.c_void_p, fp, ctypes.c_size_t]
    lib.acc_new.restype = ctypes.c_void_p
    lib.acc_new.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.acc_free.argtypes = [ctypes.c_void_p]
    lib.acc_cnt.restype = ctypes.c_int
    lib.acc_cnt.argtypes = [ctypes.c_void_p]
    lib.acc_bufin.restype = fp
    lib.acc_bufin.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.acc_bufout.restype = fp
    lib.acc_bufout.argtypes = [ctypes.c_void_p]
    lib.acc_feed.restype = ctypes.c_int
    lib.acc_feed.argtypes = [ctypes.c_void_p, ctypes.POINTER(fp), fp,
                             ctypes.c_int, ctypes.c_int]
    lib.acc_full.restype = ctypes.c_int
    lib.acc_full.argtypes = [ctypes.c_void_p]
    lib.acc_set_bufout.argtypes = [ctypes.c_void_p, fp]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load() is not None


class NativeRingBuffer:
    """Lock-free SPSC float ring (real-time safe on both ends)."""

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.rb_new(capacity)
        if not self._h:
            raise MemoryError("rb_new failed")

    @property
    def capacity(self) -> int:
        return self._lib.rb_capacity(self._h)

    def available(self) -> int:
        return self._lib.rb_available(self._h)

    def space(self) -> int:
        return self._lib.rb_space(self._h)

    def write(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        return self._lib.rb_write(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            data.size)

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.rb_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        return out[:got]

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.rb_free(h)
            self._h = None


class NativeBlockAccumulator:
    """C++ partition accumulator; same contract as stream._BlockAccumulator."""

    def __init__(self, parts: int, n_streams: int = 1):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.parts = parts
        self.n_streams = n_streams
        self._h = lib.acc_new(parts, n_streams)
        if not self._h:
            raise MemoryError("acc_new failed")

    @property
    def cnt(self) -> int:
        return self._lib.acc_cnt(self._h)

    @property
    def bufin(self) -> np.ndarray:
        """Zero-copy (n_streams, parts) view of the native input buffer."""
        base = self._lib.acc_bufin(self._h, 0)
        buf = np.ctypeslib.as_array(base, shape=(self.n_streams, self.parts))
        return buf

    def feed(self, blocks: np.ndarray, run_engine) -> np.ndarray:
        """blocks: (n_streams, k). run_engine(bufin) -> (parts,) output."""
        blocks = np.ascontiguousarray(blocks, np.float32)
        k = blocks.shape[-1]
        out = np.empty(k, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        ins = (fp * self.n_streams)(*[
            blocks[s].ctypes.data_as(fp) for s in range(self.n_streams)])
        outp = out.ctypes.data_as(fp)
        pos = 0
        while pos < k:
            pos += self._lib.acc_feed(self._h, ins, outp, pos, k)
            if self._lib.acc_full(self._h):
                result = np.ascontiguousarray(run_engine(self.bufin), np.float32)
                self._lib.acc_set_bufout(self._h, result.ctypes.data_as(fp))
        return out

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.acc_free(h)
            self._h = None
