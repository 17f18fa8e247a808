"""Test configuration: force an 8-device virtual CPU mesh before jax use.

This mirrors how multi-chip sharding is validated without TPU pods
(SURVEY.md section 4, item 4): pjit/shard_map programs compile and run on 8
virtual CPU devices; the same program runs unchanged on a real TPU mesh.

NOTE: the environment pins JAX_PLATFORMS to the TPU tunnel plugin, so the
env var alone is not sufficient — `jax.config.update("jax_platforms", ...)`
must run before any backend is initialized.
"""
import os

# TB_TEST_TPU=1 leaves the real TPU backend in place so the TPU-gated
# kernel tests (tests/test_attention_train.py, test_node_encoder_train.py:
# in-kernel TPU-PRNG dropout, Mosaic-only behavior) can run on hardware.
# Only run the kernel test files in this mode — everything needing the
# 8-device mesh will fail on a 1-chip backend by design.
_TPU_MODE = os.environ.get("TB_TEST_TPU") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not _TPU_MODE:
    assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
    assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {len(jax.devices())}"

# persistent compile cache: the heavyweight programs (91-step scan train
# step, sharded Validator) take minutes to compile on this 1-core host and
# are identical across test runs. The cache key covers backend, device
# topology and XLA flags, so the CPU entries never collide with TPU runs.
from trafficbots_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("cpu")
