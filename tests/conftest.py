"""Test configuration: force an 8-device virtual CPU mesh before jax import.

This mirrors how multi-chip sharding is validated without TPU pods
(SURVEY.md section 4, item 4): pjit/shard_map programs compile and run on 8
virtual CPU devices; the same program runs unchanged on a real TPU mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
