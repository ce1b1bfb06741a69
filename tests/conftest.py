"""Test config: run everything on CPU with 8 virtual devices.

This is the TPU-native equivalent of a "fake backend" (SURVEY.md §4): the same
mesh/sharding/collective code that runs on a pod slice runs here on one
process. Pallas kernels auto-select interpret mode off-TPU (kernels/common.py).
Env must be set before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
