"""Test config: run everything on CPU with 8 virtual devices.

This is the TPU-native equivalent of a "fake backend" (SURVEY.md §4): the same
mesh/sharding/collective code that runs on a pod slice runs here on one
process. Pallas kernels auto-select interpret mode off-TPU (kernels/common.py).

Note: this environment's sitecustomize force-registers the axon TPU plugin
and overrides JAX_PLATFORMS, so we must win via ``jax.config`` (set before
any backend initialization), not env vars. XLA_FLAGS still must be set before
``import jax``.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
