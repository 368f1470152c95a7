from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    build_mesh,
    pad_cuts_for_mesh,
    replicated,
    shard_cutout_batch,
    shard_perceptor_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "build_mesh",
    "pad_cuts_for_mesh",
    "replicated",
    "shard_cutout_batch",
    "shard_perceptor_params",
]
