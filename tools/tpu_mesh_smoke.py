"""On-TPU mesh smoke: run the SHARDED step code path on real hardware.

The multichip dryrun and the mesh tests run on virtual CPU meshes; this repo's
own history shows CPU-clean graphs miscompiling on the TPU backend (BUGS.md).
This smoke builds a 1-device jax.sharding.Mesh over the attached real chip and
executes the full sharded training step (with_sharding_constraint on the
cutout bank, sharded-weight placement, the same step builder the engine uses),
so the sharded code path itself executes on TPU at least once per round.

    python tools/tpu_mesh_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from jax.sharding import Mesh

from pixray_tpu.parallel.dryrun import run_parity, run_sharded_step
from pixray_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def main():
    devices = [d for d in jax.devices() if d.platform != "cpu"]
    if not devices:
        print("no accelerator devices — nothing to smoke", flush=True)
        return 1
    mesh = Mesh(np.asarray(devices[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))
    total = run_sharded_step(mesh, num_cuts=16)
    # trajectory parity on the real backend: the sharded and unsharded graphs
    # must agree on this hardware too, not just on virtual CPU meshes
    rep = run_parity(mesh, num_cuts=16)
    print(f"tpu_mesh_smoke OK: sharded step executed on {devices[0]}, "
          f"loss={total:.4f}; sharded-vs-unsharded parity "
          f"lossΔ={rep['loss_delta']:.1e} zΔ={rep['z_delta']:.1e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
