"""Class-based parity API mirroring the reference's C++ surface.

The reference exposes four classes — ``Clcfft``/``Clrfft`` (``cl_fft.h``)
and ``Clpconv``/``Cldconv`` (``cl_conv.h``, ``cl_dconv.h``). These wrappers
reproduce their constructor/method shapes (device index selection, baked-in
transform direction, status polling via ``get_error``/``get_cl_err``,
message callbacks, in-place host-array transforms) on top of the functional
engines in ``ops/``. New code should prefer the functional API; this layer
exists so reference users can port call sites 1:1.

Unlike the reference there is no per-object OpenCL context/queue/JIT build —
"construction" places persistent state on the chosen JAX device and jits the
step functions (compilation is cached process-wide by XLA).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops import dconv as _dconv
from .ops import pconv as _pconv
from .ops.cplx import from_complex, to_complex
from .ops.fft import cfft_split
from .ops.rfft import irfft_split, rfft_split
from .utils.devices import get_device
from .utils.errors import ArgumentError, SizeError, Status
from .utils.logging import MessageCallback, resolve_callback
from .utils.numerics import is_pow2


class Clcfft:
    """Complex-to-complex FFT object (parity with cl_fft.h:29-70).

    device_index — position in jax.devices() (clGetDeviceIDs analog)
    size         — transform length N (power of two)
    fwd          — direction baked per object, like the reference's
                   twiddle-sign-at-construction (cl_fft.cpp:88-90, quirk Q7)
    """

    def __init__(self, device_index: int = 0, size: int = 16, fwd: bool = True,
                 impl: str = "auto",
                 on_message: Optional[MessageCallback] = None,
                 user_data: Any = None, _lower: bool = True):
        self._err = Status.SUCCESS
        self._log = ""
        self._msg = resolve_callback(on_message)
        self._user_data = user_data
        try:
            if not is_pow2(size):
                raise SizeError(f"DFT size must be a power of two, got {size}")
            self.N = size
            self.forward = bool(fwd)
            self.device = get_device(device_index, on_message, user_data)
            fn = functools.partial(cfft_split, forward=self.forward, impl=impl)
            self._transform = jax.jit(fn, device=self.device)
            if _lower:   # subclasses that install their own transform's
                #          lowering skip this (it would be built and
                #          immediately discarded)
                spec = jax.ShapeDtypeStruct((self.N,), jnp.float32)
                self._lowered = self._transform.lower((spec, spec))
            else:
                self._lowered = None
            self._compiled = None
        except Exception as e:  # constructor records, does not raise (parity)
            self._err = getattr(e, "status", Status.UNKNOWN)
            self._log = str(e)
            self._msg(str(e), self._user_data)

    def transform(self, c: np.ndarray) -> int:
        """In-place DFT on N complex values (Clcfft::transform parity,
        cl_fft.cpp:153-161). Returns a status code."""
        if self._err != Status.SUCCESS:
            return int(self._err)
        arr = np.ascontiguousarray(c, dtype=np.complex64).reshape(-1)
        if arr.size != self.N:
            raise SizeError(f"expected {self.N} complex values, got {arr.size}")
        re, im = self._transform((arr.real.copy(), arr.imag.copy()))
        out = np.asarray(re) + 1j * np.asarray(im)
        np.copyto(np.asarray(c).reshape(-1), out.astype(np.complex64))
        return int(Status.SUCCESS)

    def get_error(self) -> int:
        return int(self._err)

    def get_log(self) -> str:
        """Build-log parity surface (cl_fft.h:69): the reference returned
        the OpenCL JIT build log; here it is the XLA lowering/compile
        summary of this object's transform program."""
        if self._err != Status.SUCCESS or getattr(self, "_lowered", None) is None:
            return self._log
        try:
            hlo = self._lowered.as_text()
            lines = hlo.splitlines()
            head = "\n".join(lines[:3])
            out = [f"XLA build log — device {self.device}",
                   f"{head}",
                   f"lowered StableHLO: {len(lines)} lines"]
            if self._compiled is None:
                self._compiled = self._lowered.compile()
            mem = self._compiled.memory_analysis()
            if mem is not None:
                out.append(
                    "compiled: temp={}B args={}B out={}B code={}B".format(
                        getattr(mem, "temp_size_in_bytes", "?"),
                        getattr(mem, "argument_size_in_bytes", "?"),
                        getattr(mem, "output_size_in_bytes", "?"),
                        getattr(mem, "generated_code_size_in_bytes", "?")))
            return "\n".join(out)
        except Exception as e:              # log surface must never raise
            return f"{self._log}\n(log detail unavailable: {e})"


class Clrfft(Clcfft):
    """Real-to-complex / complex-to-real FFT object (cl_fft.h:74-111).

    size is the REAL length N; spectra have N/2 packed complex bins.
    """

    def __init__(self, device_index: int = 0, size: int = 16, fwd: bool = True,
                 impl: str = "auto",
                 on_message: Optional[MessageCallback] = None,
                 user_data: Any = None):
        super().__init__(device_index, size // 2, fwd, impl, on_message,
                         user_data, _lower=False)
        if self._err != Status.SUCCESS:
            return
        self.size = size
        try:   # same ctor-records contract as the parent
            if self.forward:
                self._rfwd = jax.jit(functools.partial(rfft_split, impl=impl),
                                     device=self.device)
                self._lowered = self._rfwd.lower(
                    jax.ShapeDtypeStruct((size,), jnp.float32))
            else:
                self._rinv = jax.jit(functools.partial(irfft_split, impl=impl),
                                     device=self.device)
                spec = jax.ShapeDtypeStruct((size // 2,), jnp.float32)
                self._lowered = self._rinv.lower((spec, spec))
            self._compiled = None
        except Exception as e:
            self._err = getattr(e, "status", Status.UNKNOWN)
            self._log = str(e)
            self._msg(str(e), self._user_data)

    def transform(self, c: np.ndarray, r: Optional[np.ndarray] = None) -> int:
        """Out-of-place or in-place real transform (cl_fft.cpp:267-296):
        forward reads N reals from `r` (or `c` viewed as reals) and writes
        N/2 packed complex into `c`; inverse reads `c`, writes reals to `r`.
        """
        if self._err != Status.SUCCESS:
            return int(self._err)
        c_view = np.asarray(c)
        if r is None and c_view.dtype != np.complex64:
            # the in-place contract reinterprets c's BYTES as float32
            # (cl_fft.cpp:267-296 operates on one float buffer); a wider
            # dtype (e.g. complex128) would be silently garbage-viewed
            raise ArgumentError(
                f"in-place Clrfft.transform requires a complex64 buffer "
                f"(byte-viewed as float32), got dtype {c_view.dtype}; pass "
                f"a separate real array r= or convert c to complex64")
        if self.forward:
            src = c_view.view(np.float32).reshape(-1)[: self.size] if r is None \
                else np.asarray(r, dtype=np.float32).reshape(-1)
            if src.size != self.size:
                raise SizeError(f"expected {self.size} real values, got {src.size}")
            re, im = self._rfwd(src.copy())
            out = (np.asarray(re) + 1j * np.asarray(im)).astype(np.complex64)
            np.copyto(c_view.reshape(-1)[: self.size // 2], out)
        else:
            spec = np.ascontiguousarray(c_view, dtype=np.complex64).reshape(-1)
            if spec.size != self.size // 2:
                raise SizeError(
                    f"expected {self.size // 2} complex bins, got {spec.size}")
            y = np.asarray(self._rinv((spec.real.copy(), spec.imag.copy())))
            dst = c_view.view(np.float32).reshape(-1) if r is None \
                else np.asarray(r).reshape(-1)
            np.copyto(dst[: self.size], y.astype(np.float32))
        return int(Status.SUCCESS)


class Clpconv:
    """Partitioned-convolution object (parity with cl_conv.h:124-188).

    cvs  — convolution (IR) size in samples
    pts  — partition size (power of two); nparts = cvs/pts
    errs/uData — message callback surface (cl_conv.h:137-145)
    bin0_mode — "exact" (true convolution) or "compat" (see ops/pconv.py)
    """

    def __init__(self, device_index: int = 0, cvs: int = 1024, pts: int = 64,
                 errs: Optional[MessageCallback] = None, user_data: Any = None,
                 bin0_mode: str = "exact", impl: str = "auto"):
        self._err = Status.SUCCESS
        self._msg = resolve_callback(errs)
        self._user_data = user_data
        try:
            self.cfg = _pconv.PconvConfig.for_ir_length(
                cvs, pts, bin0_mode=bin0_mode, impl=impl)
            self.device = get_device(device_index, errs, user_data)
            self.state = jax.device_put(_pconv.pconv_init(self.cfg), self.device)
            self._step = jax.jit(functools.partial(_pconv.pconv_step, self.cfg),
                                 device=self.device, donate_argnums=(0,))
            self._step_tv = jax.jit(
                functools.partial(_pconv.pconv_step_tv, self.cfg),
                device=self.device, donate_argnums=(0,))
            self._push = jax.jit(functools.partial(_pconv.push_ir, self.cfg),
                                 device=self.device, donate_argnums=(0,))
            self._xf = None            # in-progress crossfaded IR swap
            self._xf_fns = None        # lazily-jitted (begin, step)
        except Exception as e:
            self._err = getattr(e, "status", Status.UNKNOWN)
            self._msg(str(e), self._user_data)

    def push_ir(self, ir: np.ndarray) -> int:
        """Analyze an IR into the coefficient ring (cl_conv.cpp:353-388)."""
        if self._err != Status.SUCCESS:
            return int(self._err)
        ir = np.asarray(ir, dtype=np.float32).reshape(-1)
        if ir.size != self.cfg.cvs:
            raise SizeError(f"IR must have {self.cfg.cvs} samples, got {ir.size}")
        if self._xf is not None:       # instant swap cancels any fade
            self.state = self._xf.state     # (keep the live input ring)
            self._xf = None
        self.state = self._push(self.state, ir)
        return int(Status.SUCCESS)

    def push_ir_xfade(self, ir: np.ndarray, fade_blocks: int = 8) -> int:
        """Click-free IR replacement on a live stream (beyond parity —
        the reference's push_ir swaps instantly, cl_conv.cpp:353-388).

        The next ``fade_blocks`` convolution() calls emit a per-sample
        linear blend from the outgoing to the incoming convolution (both
        exact over the whole input history); after that the engine runs
        purely on the new IR. A second call before the fade completes
        adopts the previous target as the outgoing path and fades to the
        new one (the residual blend toward the abandoned target is
        dropped, so back-to-back retargeting trades a bounded step for
        never stacking more than two paths).
        """
        if self._err != Status.SUCCESS:
            return int(self._err)
        ir = np.asarray(ir, dtype=np.float32).reshape(-1)
        if ir.size != self.cfg.cvs:
            raise SizeError(f"IR must have {self.cfg.cvs} samples, got {ir.size}")
        if fade_blocks < 1:
            raise ArgumentError(f"fade_blocks must be >= 1, got {fade_blocks}")
        if self._xf_fns is None:
            self._xf_fns = (
                jax.jit(functools.partial(_pconv.pconv_begin_xfade, self.cfg),
                        device=self.device),
                jax.jit(functools.partial(_pconv.pconv_step_xfade, self.cfg),
                        device=self.device, donate_argnums=(0,)))
        if self._xf is not None:       # retarget mid-fade (see docstring)
            self.state = self._xf.state
            self._xf = None
        self._xf = self._xf_fns[0](self.state, ir)
        self._fade_pos = 0
        self._fade_total = int(fade_blocks)
        return int(Status.SUCCESS)

    def convolution(self, output: np.ndarray, input1: np.ndarray,
                    input2: Optional[np.ndarray] = None) -> int:
        """One streaming block of pts samples (cl_conv.cpp:393-548).

        Two-argument form: LTI against the pushed IR. Three-argument form:
        time-varying — input2 streams into the coefficient ring.
        Writes pts samples into `output`, returns a status code.
        """
        if self._err != Status.SUCCESS:
            return int(self._err)
        b1 = np.asarray(input1, dtype=np.float32).reshape(-1)
        if b1.size != self.cfg.pts:
            raise SizeError(f"block must have {self.cfg.pts} samples, got {b1.size}")
        if self._xf is not None and input2 is not None:
            raise ArgumentError(
                "time-varying streaming during an IR crossfade is undefined"
                " — let the fade finish or use push_ir for an instant swap")
        if self._xf is not None:
            pts, total = self.cfg.pts, self._fade_total * self.cfg.pts
            ramp = (np.arange(pts, dtype=np.float32) + 1
                    + self._fade_pos * pts) / np.float32(total)
            self._xf, out = self._xf_fns[1](self._xf, b1, ramp)
            self._fade_pos += 1
            if self._fade_pos >= self._fade_total:    # ramp hit exactly 1
                self.state = self._xf.state
                self._xf = None
        elif input2 is None:
            self.state, out = self._step(self.state, b1)
        else:
            b2 = np.asarray(input2, dtype=np.float32).reshape(-1)
            if b2.size != self.cfg.pts:
                raise SizeError(
                    f"block must have {self.cfg.pts} samples, got {b2.size}")
            self.state, out = self._step_tv(self.state, b1, b2)
        np.copyto(np.asarray(output).reshape(-1)[: self.cfg.pts],
                  np.asarray(out, dtype=np.asarray(output).dtype))
        return int(Status.SUCCESS)

    def get_cl_err(self) -> int:
        return int(self._err)


class Cldconv:
    """Direct-convolution object (parity with cl_dconv.h:17-66).

    cvs — IR size (irsize); vsiz — processing block size (vsize).
    """

    def __init__(self, device_index: int = 0, cvs: int = 512, vsiz: int = 64,
                 errs: Optional[MessageCallback] = None, user_data: Any = None,
                 delay_compat: bool = False):
        self._err = Status.SUCCESS
        self._msg = resolve_callback(errs)
        self._user_data = user_data
        try:
            self.cfg = _dconv.DconvConfig(irsize=cvs, vsize=vsiz,
                                          delay_compat=delay_compat)
            self.device = get_device(device_index, errs, user_data)
            self.state = jax.device_put(_dconv.dconv_init(self.cfg), self.device)
            self._step = jax.jit(functools.partial(_dconv.dconv_step, self.cfg),
                                 device=self.device, donate_argnums=(0,))
            self._step_tv = jax.jit(
                functools.partial(_dconv.dconv_step_tv, self.cfg),
                device=self.device, donate_argnums=(0,))
            self._push = jax.jit(functools.partial(_dconv.push_ir, self.cfg),
                                 device=self.device, donate_argnums=(0,))
        except Exception as e:
            self._err = getattr(e, "status", Status.UNKNOWN)
            self._msg(str(e), self._user_data)

    def push_ir(self, ir: np.ndarray) -> int:
        if self._err != Status.SUCCESS:
            return int(self._err)
        ir = np.asarray(ir, dtype=np.float32).reshape(-1)
        if ir.size != self.cfg.irsize:
            raise SizeError(f"IR must have {self.cfg.irsize} samples, got {ir.size}")
        self.state = self._push(self.state, ir)
        return int(Status.SUCCESS)

    def convolution(self, output: np.ndarray, input1: np.ndarray,
                    input2: Optional[np.ndarray] = None) -> int:
        """One block of vsize samples (cl_dconv.cpp:109-148); the optional
        input2 streams time-varying coefficients."""
        if self._err != Status.SUCCESS:
            return int(self._err)
        b1 = np.asarray(input1, dtype=np.float32).reshape(-1)
        if b1.size != self.cfg.vsize:
            raise SizeError(
                f"block must have {self.cfg.vsize} samples, got {b1.size}")
        if input2 is None:
            self.state, out = self._step(self.state, b1)
        else:
            b2 = np.asarray(input2, dtype=np.float32).reshape(-1)
            self.state, out = self._step_tv(self.state, b1, b2)
        np.copyto(np.asarray(output).reshape(-1)[: self.cfg.vsize],
                  np.asarray(out, dtype=np.asarray(output).dtype))
        return int(Status.SUCCESS)

    def get_cl_err(self) -> int:
        return int(self._err)
