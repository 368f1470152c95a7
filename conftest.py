"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This is the standard JAX answer to testing multi-device sharding without real
hardware; tests exercising tpu-specific behavior must skip when unavailable.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
