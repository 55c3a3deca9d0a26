"""Device discovery and selection.

The reference selects an OpenCL device by flat index
(``clGetDeviceIDs`` + ``device_ids[i]``, e.g. ``csound/opcode.cpp:57-64``,
``test_cfft.cpp:31-40``) and announces its name. Here a "device" is a JAX
device; index selection and the name announcement are preserved.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax

from .errors import DeviceError, Status
from .logging import MessageCallback, resolve_callback


def list_devices() -> List[jax.Device]:
    """All JAX devices, in platform order (the 'clGetDeviceIDs' analog)."""
    return list(jax.devices())


def get_device(index: int = 0,
               on_message: Optional[MessageCallback] = None,
               user_data: Any = None) -> jax.Device:
    """Select a device by index, announcing its name like the reference does.

    Raises DeviceError (status DEVICE_NOT_FOUND) when the index is invalid,
    mirroring csound/opcode.cpp:57-59's init_error path.
    """
    devs = list_devices()
    if not devs:
        raise DeviceError("failed to find a device!", Status.DEVICE_NOT_FOUND)
    if index < 0 or index >= len(devs):
        raise DeviceError(
            f"device index {index} out of range (found {len(devs)})",
            Status.INVALID_DEVICE,
        )
    dev = devs[index]
    cb = resolve_callback(on_message)
    cb(f"using device: {dev.device_kind} (platform={dev.platform}, id={dev.id})",
       user_data)
    return dev
