"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pre-registers a TPU ("axon") PJRT plugin at interpreter start
and forces jax_platforms to it, so plain env vars are not enough — we must
override via jax.config before any backend is initialized. XLA_FLAGS must
still be set before the CPU client spins up, which conftest import guarantees
(pytest imports conftest before test modules).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
