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
- hosts: frame rings / seed sweeps parallelize trivially across processes (each
  engine instance is self-contained).

Meshes are built from the ``--mesh_shape`` setting: 'auto' = all local devices on
the data axis; 'D' or 'D,M' = explicit axis sizes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(mesh_shape: str = "auto", devices=None) -> Mesh | None:
    """Create a (data, model) mesh; None when only one device is available."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape in (None, "", "auto"):
        dims = (n, 1)
    else:
        parts = [int(p) for p in str(mesh_shape).split(",")]
        dims = (parts[0], parts[1] if len(parts) > 1 else 1)
    if dims[0] * dims[1] > n:
        raise ValueError(f"mesh_shape {dims} needs {dims[0] * dims[1]} devices, have {n}")
    if dims[0] * dims[1] <= 1:
        return None
    grid = np.asarray(devices[: dims[0] * dims[1]]).reshape(dims)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


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
