"""P0 exp4: per-iteration cross-check of the unified mixed-mode warp bank vs the
per-mode bank on IDENTICAL engine states, advancing along the unified kernel's
own (failing) trajectory.

For each iteration it prints, for both paths evaluated at the same (z, key, it):
loss value, grad nan/inf counts, grad max-abs, and the post-update z health of
the unified step.  The first line where only the unified path is non-finite
pinpoints the (state, parity) the miscompile needs; if BOTH paths are
non-finite the previous unified update poisoned z itself.

Run on TPU:  python tools/exp4_unified_fwd.py
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

from pixray_tpu.config import apply_settings
from pixray_tpu.engine.core import Engine
from pixray_tpu.engine.step import build_loss_fn, build_step


def tree_flat(t):
    leaves = [jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(t)]
    return jnp.concatenate(leaves) if leaves else jnp.zeros((0,), jnp.float32)


def health(v):
    v = np.asarray(v)
    return f"nan={int(np.isnan(v).sum())} inf={int(np.isinf(v).sum())} maxabs={np.abs(v[np.isfinite(v)]).max() if np.isfinite(v).any() else float('nan'):.4g}"


def main():
    settings = apply_settings(dict(
        drawer="pixel", prompts="sunrise", clip_models="ViT-B/32",
        size=[384, 216], num_cuts=64, batches=1, iterations=100,
        save_every=100000, display_every=100000, init_noise=None,
        vector_prompts="none", seed=1, outdir="", save_intermediates=False,
        learning_rate_drops=[], steps_per_call=1,
    ), apply_side_effects=False)
    e = Engine(settings)

    def make_vg(unified: bool):
        if unified:
            os.environ["PIXRAY_TPU_UNIFIED_WARP"] = "1"
        else:
            os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
        lf = build_loss_fn(e.step_cfg)
        vg = jax.jit(jax.value_and_grad(lf, has_aux=True))
        # force the trace NOW while the env var is set (it is read at trace time)
        k0 = jax.random.PRNGKey(0)
        out = vg(e.z, e.refs, k0, 0, 0)
        jax.block_until_ready(out)
        return vg

    def make_step(unified: bool):
        if unified:
            os.environ["PIXRAY_TPU_UNIFIED_WARP"] = "1"
        else:
            os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)
        st, _ = build_step(e.step_cfg, e.optimizer)
        # build_step donates (z, opt_state) — warm up on COPIES so the engine's
        # own buffers survive for the probe loop
        cp = jax.tree_util.tree_map(jnp.array, (e.z, e.opt_state))
        out = st(cp[0], cp[1], jax.random.PRNGKey(0), 0, 0, e.lr_scale, e.refs)
        jax.block_until_ready(out)
        return st

    print("tracing per-mode ...", flush=True)
    vg_pm = make_vg(False)
    print("tracing unified ...", flush=True)
    vg_un = make_vg(True)
    print("tracing unified step ...", flush=True)
    step_un = make_step(True)
    os.environ.pop("PIXRAY_TPU_UNIFIED_WARP", None)

    z, opt_state, key = e.z, e.opt_state, e.key
    for it in range(6):
        key, k_step = jax.random.split(key)
        k_loss = jax.random.split(k_step, e.step_cfg.batches)[0]
        row = {}
        for name, vg in (("permode", vg_pm), ("unified", vg_un)):
            (total, (vals, _img)), g = vg(z, refs_or(e), k_loss, it, 0)
            gf = np.asarray(tree_flat(g))
            row[name] = (float(np.asarray(total)), gf)
            print(f"it={it} {name:8s} loss={float(np.asarray(total)):.6f} "
                  f"grad[{health(gf)}]", flush=True)
        d = np.abs(row["permode"][1] - row["unified"][1])
        finite = np.isfinite(d)
        print(f"it={it} grad-diff maxabs={d[finite].max() if finite.any() else float('nan'):.4g} "
              f"loss-diff={abs(row['permode'][0] - row['unified'][0]):.3e}", flush=True)
        # advance along the UNIFIED trajectory (the failing one)
        z, opt_state, total, vals, _img = step_un(
            z, opt_state, k_step, it, 0, e.lr_scale, e.refs
        )
        zf = np.asarray(tree_flat(z))
        print(f"it={it} unified-step total={float(np.asarray(total)):.6f} "
              f"z[{health(zf)}]", flush=True)


def refs_or(e):
    return e.refs


if __name__ == "__main__":
    main()
