"""Subprocess worker for the 2-process DCN-mesh test (tests/test_multihost.py).

Each OS process owns 2 virtual CPU devices and joins a jax.distributed cluster
via ``pixray_tpu.parallel.mesh.init_distributed`` (driven by the same
$PIXRAY_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID env contract the engine
uses), then compiles + runs ONE full sharded training step over the canonical
'hosts' mesh — data axis across processes (DCN), model axis within (ICI).

Run via: python tests/multihost_worker.py  (env-configured; prints a sentinel).
"""

import os
import sys

# device count must be fixed before the CPU client exists
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
# accelerator plugins (e.g. the axon relay) must not join the cluster
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cross-process CPU collectives need a real transport; gloo ships with jaxlib
jax.config.update("jax_cpu_collectives_implementation", "gloo")
# same persistent compile cache as conftest.py — repeat runs skip the
# full-step XLA compile
_cache = os.environ.get("PIXRAY_TPU_TEST_CACHE", "/tmp/pixray_tpu_jax_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from pixray_tpu.parallel.dryrun import run_sharded_step  # noqa: E402
from pixray_tpu.parallel.mesh import build_mesh, init_distributed  # noqa: E402


def main() -> None:
    joined = init_distributed()
    assert joined, "worker did not join a >1-process cluster"

    cpus = jax.devices("cpu")
    pid = int(os.environ["PIXRAY_TPU_PROCESS_ID"])
    hosts = len({d.process_index for d in cpus})
    local = sum(1 for d in cpus if d.process_index == cpus[0].process_index)
    mesh = build_mesh("hosts", devices=cpus)
    assert mesh is not None and dict(mesh.shape) == {"data": hosts, "model": local}, (
        f"expected ({hosts},{local}) hosts-mesh, got {mesh and dict(mesh.shape)}"
    )
    # the data (DCN) axis must place each host's devices in distinct rows
    rows = mesh.devices
    for r in range(rows.shape[0]):
        assert len({d.process_index for d in rows[r]}) == 1, (
            "model axis crosses a host boundary"
        )

    total = run_sharded_step(mesh)
    print(f"MULTIHOST_OK pid={pid} hosts={hosts} local={local} loss={total:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
