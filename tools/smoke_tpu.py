"""On-hardware convergence smoke: 60 optimizer steps of the flagship config
must strictly reduce the CLIP-prompt loss.  Run manually on TPU:

    python tools/smoke_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from pixray_tpu.config import apply_settings
from pixray_tpu.engine.core import Engine

settings = apply_settings(dict(drawer="pixel", prompts="sunrise", clip_models="ViT-B/32",
    size=[384,216], num_cuts=64, batches=1, iterations=100, save_every=100000,
    display_every=100000, init_noise=None, vector_prompts="none", seed=1, outdir="",
    save_intermediates=False, learning_rate_drops=[]), apply_side_effects=False)
e = Engine(settings)
losses = []
for it in range(60):
    e.train(it)
    losses.append(float(np.asarray(e.last_loss_values).sum()))
print("first5:", [f"{l:.4f}" for l in losses[:5]], flush=True)
print("last5:", [f"{l:.4f}" for l in losses[-5:]], flush=True)
assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.01, "loss did not descend"
print("CONVERGENCE OK", flush=True)
