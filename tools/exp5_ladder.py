"""P0 exp5: rung-ladder localization of the unified-warp wrong-gradient bug.

exp4 showed the unified path's z-gradient is WRONG (90x small) at iteration 0
and NaN at iteration 1 on TPU, while loss values match per-mode to 1e-4.  Each
rung below compares unified vs per-mode z/work gradients on an increasing
subgraph; the first rung that diverges is the minimal repro.

    rung A: sum(bank**2) wrt WORK, fixed matrices      (isolation — crosscheck analog)
    rung B: sum(bank**2) wrt Z through synth+pool      (adds cellrender)
    rung C: B + jitter + noise epilogue                (adds color math)
    rung D: C + CLIP encode + prompt loss              (full)

Run on TPU:  python tools/exp5_ladder.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pixray_tpu.config import apply_settings
from pixray_tpu.engine.core import Engine
from pixray_tpu.engine import cutouts as C


def flat(t):
    ls = [jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(t)]
    return np.asarray(jnp.concatenate(ls))


def compare(tag, f, *args):
    """Trace f twice (env-gated unified flag read at trace time), compare grads."""
    outs = {}
    for name, flag in (("permode", None), ("unified", "1")):
        if flag:
            os.environ["PIXRAY_TPU_UNIFIED_WARP"] = flag
        else:
            os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
        vg = jax.jit(jax.value_and_grad(f))
        v, g = vg(*args)
        jax.block_until_ready(g)
        outs[name] = (float(np.asarray(v)), flat(g))
    os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
    (vp, gp), (vu, gu) = outs["permode"], outs["unified"]
    d = np.abs(gp - gu)
    fin = np.isfinite(d)
    rel = d[fin].max() / (np.abs(gp[fin]).max() + 1e-12) if fin.any() else float("nan")
    print(f"{tag}: loss p={vp:.6f} u={vu:.6f} | grad nan p={int(np.isnan(gp).sum())} "
          f"u={int(np.isnan(gu).sum())} | maxabs p={np.abs(gp).max():.4g} "
          f"u={np.abs(gu[np.isfinite(gu)]).max() if np.isfinite(gu).any() else float('nan'):.4g} "
          f"| rel-diff {rel:.3e}", flush=True)


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

    aspect = cfg.aspect
    cut_size = spec.cut_size
    transforms = C.sample_cut_transforms(k_t, cut_size, cfg.num_cuts, aspect)

    for it in (0, 1):
        reflect = (it % 2) == 0
        par = f"it={it} ({'refl' if reflect else 'border'})"

        def render(work, jitter=False):
            return C.render_cutouts(
                work, transforms, cut_size,
                reflect_padding=jnp.asarray(reflect),
                fill_color=jnp.float32(0.37),
                noise_key=k_noise,
                jitter_key=k_jit if jitter else None,
                compute_dtype=cfg.compute_dtype if jitter else None,
            )

        def synth_rgb(z):
            # replicate loss_fn's alpha handling (step.py:124-130): the pixel
            # drawer emits RGBA; transparent=False keeps the color planes only
            img = drawer.synth(refs["drawer_params"], z, it, k_synth)
            return img[..., :3] if img.shape[-1] == 4 else img

        # rung A: wrt fixed work canvas
        work0 = jax.lax.stop_gradient(C.pool_to_work(synth_rgb(z0), cut_size, aspect))
        compare(f"A {par} (wrt work)      ", lambda w: jnp.sum(render(w) ** 2), work0)

        # rung B: wrt z through synth+pool
        def fB(z):
            return jnp.sum(render(C.pool_to_work(synth_rgb(z), cut_size, aspect)) ** 2)
        compare(f"B {par} (wrt z)         ", fB, z0)

        # rung C: + jitter/noise epilogue
        def fC(z):
            return jnp.sum(
                render(C.pool_to_work(synth_rgb(z), cut_size, aspect), jitter=True) ** 2
            )
        compare(f"C {par} (+jitter)       ", fC, z0)

        # rung D: + CLIP encode + prompt losses
        from pixray_tpu.engine.prompts import prompt_losses

        def fD(z):
            batch = render(C.pool_to_work(synth_rgb(z), cut_size, aspect), jitter=True)
            iii = spec.image_fn(refs["perceptors"][spec.name], batch)
            return jnp.sum(prompt_losses(iii, spec.table))
        compare(f"D {par} (+CLIP)         ", fD, z0)


if __name__ == "__main__":
    main()
