"""Test configuration: force an 8-device virtual CPU mesh before jax use.

This mirrors how multi-chip sharding is validated without TPU pods
(SURVEY.md section 4, item 4): pjit/shard_map programs compile and run on 8
virtual CPU devices; the same program runs unchanged on a real TPU mesh.

NOTE: the environment pins JAX_PLATFORMS to the TPU tunnel plugin, so the
env var alone is not sufficient — `jax.config.update("jax_platforms", ...)`
must run before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {len(jax.devices())}"
