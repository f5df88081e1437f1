"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (the TPU-native answer to
"test multi-node without a real cluster"). The environment's sitecustomize
registers the TPU backend at interpreter startup, so we must override via
jax.config (backends initialize lazily, so this still wins).
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
