"""P0 exp6: ground-truth matrix for the rung-C divergence (exp5).

exp5 found the unified and per-mode Pallas warp paths produce wildly different
z-gradients once the jitter+noise epilogue is appended (rel-diff 0.78), while
matching to 1e-7 without it.  Which side is wrong?  The XLA warp path
mis-executes on this TPU backend (cutouts.py:44-47), so ground truth is the
XLA path ON CPU.  All paths are compared at f32/highest precision (legit
numerical scatter ~1e-5) and then at the bf16 defaults.

Run on TPU:  python tools/exp6_groundtruth.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_platforms", "axon,cpu")  # expose CPU next to the TPU plugin

from pixray_tpu.config import apply_settings
from pixray_tpu.engine.core import Engine
from pixray_tpu.engine import cutouts as C
from pixray_tpu.ops import pallas_warp as PW


def flat(t):
    ls = [jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(t)]
    return np.asarray(jnp.concatenate(ls))


def main():
    settings = apply_settings(dict(
        drawer="pixel", prompts="sunrise", clip_models="ViT-B/32",
        size=[384, 216], num_cuts=64, batches=1, iterations=100,
        save_every=100000, display_every=100000, init_noise=None,
        vector_prompts="none", seed=1, outdir="", save_intermediates=False,
        learning_rate_drops=[], steps_per_call=1,
    ), apply_side_effects=False)
    e = Engine(settings)
    cfg = e.step_cfg
    spec = cfg.perceptors[0]
    drawer = cfg.drawer
    refs = e.refs
    z0 = jax.tree_util.tree_map(jnp.array, e.z)
    key = jax.random.PRNGKey(42)
    k_synth, k_t, k_jit, k_noise = jax.random.split(key, 4)
    cut_size = spec.cut_size
    aspect = cfg.aspect
    transforms = C.sample_cut_transforms(k_t, cut_size, cfg.num_cuts, aspect)
    cpu = jax.devices("cpu")[0]

    for it in (0, 1):
        reflect = (it % 2) == 0
        for prec, cdt, tol_note in (("highest", None, "f32 exact"), ("bf16", jnp.bfloat16, "defaults")):
            PW.WARP_PREC = prec

            def fC(z):
                img = drawer.synth(refs["drawer_params"], z, it, k_synth)
                img = img[..., :3] if img.shape[-1] == 4 else img
                work = C.pool_to_work(img, cut_size, aspect)
                batch = C.render_cutouts(
                    work, transforms, cut_size,
                    reflect_padding=jnp.asarray(reflect),
                    fill_color=jnp.float32(0.37),
                    noise_key=k_noise, jitter_key=k_jit, compute_dtype=cdt,
                )
                return jnp.sum(batch ** 2)

            grads = {}
            # CPU ground truth (XLA warp path via platform_dependent)
            os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
            with jax.default_device(cpu):
                z_c = jax.device_put(z0, cpu)
                v, g = jax.jit(jax.value_and_grad(fC))(z_c)
                grads["cpu-truth "] = (float(v), flat(g))
            # TPU per-mode Pallas
            v, g = jax.jit(jax.value_and_grad(fC))(z0)
            grads["tpu-perm  "] = (float(v), flat(g))
            # TPU unified Pallas (kernel bwd)
            os.environ["PIXRAY_TPU_UNIFIED_WARP"] = "1"
            v, g = jax.jit(jax.value_and_grad(fC))(z0)
            grads["tpu-uni   "] = (float(v), flat(g))
            # TPU unified forward + XLA adjoint
            os.environ["PIXRAY_TPU_UNIFIED_BWD"] = "xla"
            v, g = jax.jit(jax.value_and_grad(fC))(z0)
            grads["tpu-uni-xb"] = (float(v), flat(g))
            os.environ.pop("PIXRAY_TPU_UNIFIED_BWD", None)
            os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)

            vt, gt = grads["cpu-truth "]
            scale = np.abs(gt).max() + 1e-12
            print(f"--- it={it} ({'refl' if reflect else 'border'}) prec={prec} ({tol_note})", flush=True)
            for name, (v, g) in grads.items():
                d = np.abs(g - gt)
                fin = np.isfinite(d)
                print(f"  {name} loss={v:.2f} nan={int(np.isnan(g).sum())} "
                      f"maxabs={np.abs(g[np.isfinite(g)]).max():.4g} "
                      f"rel-vs-truth={d[fin].max() / scale if fin.any() else float('nan'):.3e}",
                      flush=True)


if __name__ == "__main__":
    main()
