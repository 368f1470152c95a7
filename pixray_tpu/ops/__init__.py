from .grad import clamp_with_grad, l2_normalize, replace_grad, spherical_dist_loss
from .pool import adaptive_avg_pool, adaptive_max_pool

__all__ = [
    "clamp_with_grad",
    "l2_normalize",
    "replace_grad",
    "spherical_dist_loss",
    "adaptive_avg_pool",
    "adaptive_max_pool",
]
