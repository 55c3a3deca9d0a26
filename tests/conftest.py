"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU in this environment sits behind a relay with ~30ms host-sync
latency and only one chip; tests exercise numerics and sharding, so they run
on CPU with 8 virtual devices (multi-chip sharding paths compile and execute
exactly as they would on an 8-chip slice). Must run before jax creates its
backends, hence the env mutation at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
