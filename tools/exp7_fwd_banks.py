"""P0 exp7: is the rung-C divergence an XLA fusion-context effect?

exp5 rung B: unified and per-mode BANK VALUES agree to 1e-7 at bf16.
exp6: appending the bf16 jitter epilogue makes the unified path's gradient
wrong by 78% — with BOTH backward arms agreeing exactly.  Identical values
through an identical epilogue cannot legitimately diverge, so the suspect is
XLA compiling the epilogue differently per PRODUCER (single fused pallas_call
vs concatenate of three), moving the bf16 rounding and thus the set of exact
gray ties where the hue jitter's gradient is zeroed by design (ops/color.py).

Matrix (all at bf16 defaults, loss = sum(epilogue(bank)^2) wrt WORK):
    perm        — per-mode kernels, fused graph
    uni         — unified kernel, fused graph
    uni+barrier — unified kernel, lax.optimization_barrier between bank and epilogue
    perm+barrier
    cpu truth   — XLA warp on CPU
If uni+barrier matches truth while uni doesn't, the kernel is exonerated and
the fix is a barrier (or explicit cast) at the cutouts.py boundary.

Run on TPU:  python tools/exp7_fwd_banks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("PIXRAY_TPU_SQUARE_WORK", "0")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pixray_tpu.config import apply_settings
from pixray_tpu.engine.core import Engine
from pixray_tpu.engine import cutouts as C


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
    refs = e.refs
    z0 = jax.tree_util.tree_map(jnp.array, e.z)
    key = jax.random.PRNGKey(42)
    k_synth, k_t, k_jit, k_noise = jax.random.split(key, 4)
    cut_size = spec.cut_size
    aspect = cfg.aspect
    transforms = C.sample_cut_transforms(k_t, cut_size, cfg.num_cuts, aspect)
    nz = transforms[0].shape[0]

    img = cfg.drawer.synth(refs["drawer_params"], z0, 0, k_synth)
    work0 = jax.lax.stop_gradient(C.pool_to_work(img[..., :3], cut_size, aspect))

    from functools import partial

    from pixray_tpu.ops.color import random_color_jitter

    def epilogue(raw):
        """render_cutouts' epilogue, reproduced exactly (same keys, same order):
        bf16 cast → per-cut jitter → scaled noise → f32."""
        b = raw.astype(jnp.bfloat16)
        keys = jax.random.split(k_jit, b.shape[0])
        b = jax.vmap(partial(random_color_jitter, hue=0.1, saturation=0.1, p=0.8))(keys, b)
        k_fac, k_n = jax.random.split(k_noise)
        facs = jax.random.uniform(k_fac, (b.shape[0], 1, 1, 1), maxval=C.NOISE_FAC, dtype=b.dtype)
        return (b + facs * jax.random.normal(k_n, b.shape, dtype=b.dtype)).astype(jnp.float32)

    def raw_bank(w):
        """The warp bank with NO epilogue (jitter_key=None skips jitter; the
        in-render noise is keyed off noise_key, so we pass a dummy and redo the
        real noise in epilogue() — set NOISE_FAC=0 for the raw call instead)."""
        saved = C.NOISE_FAC
        return C.render_cutouts(
            w, transforms, cut_size, reflect_padding=jnp.asarray(True),
            fill_color=jnp.float32(0.37), noise_key=jax.random.PRNGKey(0),
            jitter_key=None, compute_dtype=None,
        )

    # disable the in-render noise entirely; epilogue() owns jitter AND noise so
    # both variants consume identical randomness
    C.NOISE_FAC_SAVED = C.NOISE_FAC

    def make_f(barrier: bool):
        def f(w):
            C.NOISE_FAC = 0.0
            try:
                raw = raw_bank(w)
            finally:
                C.NOISE_FAC = C.NOISE_FAC_SAVED
            if barrier:
                raw = jax.lax.optimization_barrier(raw)
            return jnp.sum(epilogue(raw) ** 2)
        return f

    results = {}

    def run(name, unified, barrier, device=None):
        if unified:
            os.environ["PIXRAY_TPU_UNIFIED_WARP"] = "1"
        else:
            os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
        f = make_f(barrier)
        if device is not None:
            with jax.default_device(device):
                v, g = jax.jit(jax.value_and_grad(f))(jax.device_put(work0, device))
        else:
            v, g = jax.jit(jax.value_and_grad(f))(work0)
        os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
        results[name] = (float(v), np.asarray(g, np.float32))

    cpu = jax.devices("cpu")[0]
    run("cpu-truth   ", False, False, cpu)
    run("cpu-barrier ", False, True, cpu)
    run("perm        ", False, False)
    run("perm+barrier", False, True)
    run("uni         ", True, False)
    run("uni+barrier ", True, True)

    vt, gt = results["cpu-truth   "]
    scale = np.abs(gt).max() + 1e-12
    for name, (v, g) in results.items():
        d = np.abs(g - gt)
        fin = np.isfinite(d)
        print(f"{name} loss={v:.2f} nan={int(np.isnan(g).sum())} "
              f"maxabs={np.abs(g[np.isfinite(g)]).max():.5g} "
              f"rel-vs-truth={d[fin].max() / scale:.3e}", flush=True)


if __name__ == "__main__":
    main()
