"""Utility-layer tests: checkpoint, errors, numerics, devices, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencl_fft_tpu.utils import checkpoint as ckpt
from opencl_fft_tpu.utils.devices import get_device, list_devices
from opencl_fft_tpu.utils.errors import (DeviceError, FftError, SizeError,
                                         Status, error_string)
from opencl_fft_tpu.utils.numerics import bit_reverse_indices, ilog2, is_pow2, np2
from opencl_fft_tpu.utils.profiling import fft_flops, pconv_flops_per_block


def test_np2_reference_parity():
    """np2 semantics of csound/opcode.cpp:30-35: minimum 2, rounds up."""
    assert np2(0) == 2
    assert np2(1) == 2
    assert np2(2) == 2
    assert np2(3) == 4
    assert np2(1024) == 1024
    assert np2(1025) == 2048


def test_pow2_helpers():
    assert is_pow2(1) and is_pow2(64) and not is_pow2(12) and not is_pow2(0)
    assert ilog2(1024) == 10
    with pytest.raises(ValueError):
        ilog2(12)


def test_bit_reverse_indices():
    """Same construction as cl_fft.cpp:96-101."""
    np.testing.assert_array_equal(bit_reverse_indices(8),
                                  [0, 4, 2, 6, 1, 5, 3, 7])
    n = 64
    b = bit_reverse_indices(n)
    assert sorted(b) == list(range(n))            # a permutation
    np.testing.assert_array_equal(b[b], np.arange(n))   # an involution


def test_error_strings():
    assert error_string(Status.SUCCESS) == "Success!"
    assert error_string(Status.DEVICE_NOT_FOUND) == "Device not found."
    assert error_string(-424242) == "Unknown error"
    e = SizeError("too big")
    assert isinstance(e, FftError)
    assert e.status == Status.INVALID_BUFFER_SIZE


def test_device_selection():
    devs = list_devices()
    assert len(devs) >= 1
    msgs = []
    d = get_device(0, on_message=lambda m, u: msgs.append(m))
    assert d is devs[0]
    assert msgs and "using device" in msgs[0]
    with pytest.raises(DeviceError):
        get_device(10_000)


def test_checkpoint_roundtrip(tmp_path):
    from opencl_fft_tpu.ops.pconv import PconvConfig, pconv_init, pconv_step, push_ir
    rng = np.random.default_rng(0)
    cfg = PconvConfig.for_ir_length(64, 16)
    st = push_ir(cfg, pconv_init(cfg), rng.standard_normal(64).astype(np.float32))
    st, _ = pconv_step(cfg, st, rng.standard_normal(16).astype(np.float32))

    path = os.path.join(tmp_path, "state.npz")
    ckpt.save_state(path, st, meta={"pts": 16})
    restored = ckpt.load_state(path, pconv_init(cfg))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_meta(path) == {"pts": 16}

    # resuming produces the identical stream
    blk = rng.standard_normal(16).astype(np.float32)
    _, o1 = pconv_step(cfg, st, blk)
    _, o2 = pconv_step(cfg, restored, blk)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_checkpoint_leaf_mismatch(tmp_path):
    path = os.path.join(tmp_path, "x.npz")
    ckpt.save_state(path, {"a": jnp.zeros(3)})
    with pytest.raises(ValueError):
        ckpt.load_state(path, {"a": jnp.zeros(3), "b": jnp.zeros(2)})


def test_flop_conventions():
    assert fft_flops(1024) == 5 * 1024 * 10
    assert fft_flops(16, batch=2) == 2 * 5 * 16 * 4
    assert pconv_flops_per_block(512, 256) == 2 * fft_flops(512) + 8 * 256 * 512
