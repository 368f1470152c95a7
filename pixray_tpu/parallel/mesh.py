"""Device-mesh layer: sharding the optimization step across TPU chips.

The reference is strictly single-device (/root/reference/pixray.py:609-610; see
SURVEY.md §2.3) — this layer is new capability.  Parallel axes of this workload:

- **data**: the cutout batch (num_cuts × batches) through the perceptor
  forward+backward — the dominant FLOPs.  We annotate the cutout batch with a
  `data`-axis sharding inside the jitted step; XLA shards the CLIP tower across
  the mesh and inserts the psum that reduces per-shard latent gradients onto the
  replicated latent.  Collectives ride ICI; no NCCL-style code exists anywhere.
- **model**: reserved for perceptor-ensemble placement (one ensemble member per
  device group) and future tensor-parallel towers.
- **hosts (DCN)**: multi-process meshes put the host dimension on the OUTER
  (data) axis: only the per-shard latent-gradient psum crosses DCN — one
  (z-sized) all-reduce per step — while the model axis (ensemble placement /
  FSDP gathers, the chatty collectives) stays inside a host's ICI domain.
  ``init_distributed`` wires ``jax.distributed.initialize``; frame rings / seed
  sweeps additionally parallelize trivially across independent engines.

Meshes are built from the ``--mesh_shape`` setting: 'auto' = all (global)
devices on the data axis; 'D' or 'D,M' = explicit axis sizes; 'hosts' =
(process_count, devices_per_process) — the canonical DCN×ICI layout.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join a multi-host JAX cluster (no-op when not configured).

    Args fall back to $PIXRAY_TPU_COORDINATOR / $PIXRAY_TPU_NUM_PROCESSES /
    $PIXRAY_TPU_PROCESS_ID, and from there to jax.distributed's own
    auto-detection (TPU pod metadata, SLURM, ...).  Returns True when the
    process is part of a >1-process cluster afterwards.  After this,
    ``jax.devices()`` is GLOBAL and ``build_mesh`` spans all hosts; collectives
    across the host boundary ride DCN.
    """
    coordinator = coordinator or os.environ.get("PIXRAY_TPU_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["PIXRAY_TPU_NUM_PROCESSES"])
        if "PIXRAY_TPU_NUM_PROCESSES" in os.environ else None
    )
    process_id = process_id if process_id is not None else (
        int(os.environ["PIXRAY_TPU_PROCESS_ID"])
        if "PIXRAY_TPU_PROCESS_ID" in os.environ else None
    )
    if jax.distributed.is_initialized():
        return True  # already joined (idempotent under engine re-init)
    if coordinator is None and num_processes is None:
        return False  # single-process run, nothing to join
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.distributed.is_initialized()


def build_mesh(mesh_shape: str = "auto", devices=None) -> Mesh | None:
    """Create a (data, model) mesh; None when only one device is available.

    Multi-process: ``jax.devices()`` is the global device list, ordered by
    process index — the plain reshape therefore places whole hosts contiguously
    along the leading (data) axis, so the model axis only spans devices within
    a host whenever the model-axis size divides the per-host device count (the
    DCN-for-DP / ICI-for-model layout).  'hosts' selects exactly
    (process_count, devices_per_process).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape in (None, "", "auto"):
        dims = (n, 1)
    elif mesh_shape == "hosts":
        # derive the host count from the devices themselves (not
        # jax.process_count(), which reports the DEFAULT backend's processes —
        # wrong when an accelerator plugin coexists with a distributed CPU mesh)
        procs = len({d.process_index for d in devices})
        dims = (procs, n // procs)
    else:
        parts = [int(p) for p in str(mesh_shape).split(",")]
        dims = (parts[0], parts[1] if len(parts) > 1 else 1)
    if dims[0] * dims[1] > n:
        raise ValueError(f"mesh_shape {dims} needs {dims[0] * dims[1]} devices, have {n}")
    if dims[0] * dims[1] <= 1:
        return None
    grid = np.asarray(devices[: dims[0] * dims[1]]).reshape(dims)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def host_local(x) -> np.ndarray:
    """Fetch a REPLICATED array's value on this host.

    Multi-process global arrays span non-addressable devices, so ``np.asarray``
    raises even when every device holds the full value; the local shard of a
    replicated array IS the global value.  Single-process arrays pass through.
    """
    try:
        return np.asarray(x)
    except RuntimeError:
        shard = x.addressable_shards[0]
        assert shard.data.shape == x.shape, (
            f"expected a replicated array, got shard {shard.data.shape} of {x.shape}"
        )
        return np.asarray(shard.data)


def shard_cutout_batch(batch, mesh: Mesh | None):
    """Constrain a (N, S, S, C) cutout batch to be data-sharded on axis 0.

    Under grad, XLA inserts the all-reduce of latent-gradient contributions
    automatically — the 'annotate shardings, let the compiler place collectives'
    recipe.
    """
    if mesh is None:
        return batch
    return jax.lax.with_sharding_constraint(
        batch, NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    )


def replicated(tree, mesh: Mesh | None):
    """Explicitly mark a pytree replicated over the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_perceptor_params(variables, mesh: Mesh | None):
    """FSDP-style weight sharding: 2D+ parameter leaves are sharded along their
    largest dimension over the ``model`` axis (XLA all-gathers shards just-in-time
    during the forward/backward).  With model=1 (or no mesh) this is replication.
    """
    if mesh is None or mesh.shape[MODEL_AXIS] <= 1:
        return replicated(variables, mesh)
    m = mesh.shape[MODEL_AXIS]

    def shard_leaf(x):
        if x.ndim >= 2:
            # choose the largest axis divisible by the model-axis size
            order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
            for axis in order:
                if x.shape[axis] % m == 0:
                    spec = [None] * x.ndim
                    spec[axis] = MODEL_AXIS
                    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(shard_leaf, variables)


def pad_cuts_for_mesh(num_cuts: int, mesh: Mesh | None) -> int:
    """Round the cutout count up to a multiple of the data-axis size."""
    if mesh is None:
        return num_cuts
    d = mesh.shape[DATA_AXIS]
    return -(-num_cuts // d) * d
