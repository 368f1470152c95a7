"""Test configuration: route tests to an 8-device virtual CPU mesh.

The execution environment may pre-register an accelerator backend at interpreter
startup (before conftest runs), so JAX_PLATFORMS alone is not sufficient.  We set
the host-platform device-count flag BEFORE the CPU client is created, force CPU
client creation, and make cpu:0 the default device — the standard JAX answer to
testing multi-device sharding without a cluster.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# FORCE cpu (not setdefault): the execution environment exports
# JAX_PLATFORMS=axon, and a pytest run inheriting it creates a second client
# on the single-TPU relay — which wedges BOTH the tests and any concurrent
# bench/engine process on the tunnel (observed round 5; see BUGS.md).  Tests
# are CPU-by-design; opt into another platform explicitly via
# PIXRAY_TPU_TEST_PLATFORM.
os.environ["JAX_PLATFORMS"] = os.environ.get("PIXRAY_TPU_TEST_PLATFORM", "cpu")
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")  # tests never fetch assets

import jax  # noqa: E402

# The env var alone is NOT enough: the environment's sitecustomize may have
# already called jax.config.update("jax_platforms", "axon,cpu") at interpreter
# startup, which outranks JAX_PLATFORMS.  With that setting, even
# jax.devices("cpu") first initializes the axon backend — a second client on
# the single-TPU relay, which wedges both this process and any concurrent
# engine/bench process on the tunnel (observed round 5, see BUGS.md).  A later
# config.update wins, and at conftest time no backend is initialized yet.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

try:
    _cpu_devices = jax.devices("cpu")  # creates the CPU client under XLA_FLAGS
    jax.config.update("jax_default_device", _cpu_devices[0])
except RuntimeError:  # pragma: no cover
    pass

# CPU executables serialize fine (unlike the axon TPU relay), so the persistent
# compilation cache turns repeat local runs of the compile-dominated fast tier
# from minutes into seconds.  Fresh CI machines simply miss the cache.
_cache_dir = os.environ.get("PIXRAY_TPU_TEST_CACHE", "/tmp/pixray_tpu_jax_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
