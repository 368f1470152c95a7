"""On-hardware convergence smoke + numerics gate for the flagship config.

Two checks (run manually on TPU, and invoked by bench.py before it publishes):

1. **Descent**: 60 optimizer steps must strictly reduce the CLIP-prompt loss.
2. **Precision-ladder gate**: the DEFAULT kernel-precision trajectory's final
   loss must land within a band of the exact-arithmetic reference trajectory
   (``PIXRAY_TPU_WARP_PREC=highest``, run as a subprocess because the
   precision default is bound at import).  A future precision rung (int8/bf16
   quantization, banding, layout change) that quietly degrades convergence
   fails this gate instead of shipping; matching the reference's determinism
   hooks (/root/reference/pixray.py:589-606, 1776) in spirit — seeded runs are
   reproducible, so the band only needs to cover legitimate
   rounding-induced trajectory divergence, not run-to-run noise.

Usage:
    python tools/smoke_tpu.py             # descent + gate (default)
    python tools/smoke_tpu.py --no-gate   # descent only
    python tools/smoke_tpu.py --emit-final  # print final-loss JSON (gate helper)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

# the default-vs-highest final-loss band: highest re-runs the same seeded
# trajectory with exact f32 warp matmuls; divergence beyond this is a real
# numerics regression, not rounding drift (measured default-vs-highest gap
# ~0.01-0.03 on v5e at 60 steps)
GATE_BAND = float(os.environ.get("PIXRAY_TPU_SMOKE_BAND", "0.08"))
STEPS = int(os.environ.get("PIXRAY_TPU_SMOKE_STEPS", "60"))


def run_trajectory(steps=STEPS):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from pixray_tpu.config import apply_settings
    from pixray_tpu.engine.core import Engine

    settings = apply_settings(dict(drawer="pixel", prompts="sunrise", clip_models="ViT-B/32",
        size=[384, 216], num_cuts=64, batches=1, iterations=steps + 40, save_every=100000,
        display_every=100000, init_noise=None, vector_prompts="none", seed=1, outdir="",
        save_intermediates=False, learning_rate_drops=[]), apply_side_effects=False)
    e = Engine(settings)
    losses = []
    for it in range(steps):
        e.train(it)
        losses.append(float(np.asarray(e.last_loss_values).sum()))
    return losses


def main():
    import numpy as np

    ref = None
    if "--emit-final" not in sys.argv and "--no-gate" not in sys.argv:
        # the chip is a single EXCLUSIVE-access device: the reference
        # subprocess must run (and exit) BEFORE this process creates its TPU
        # client, or it blocks forever waiting for the device
        env = dict(os.environ, PIXRAY_TPU_WARP_PREC="highest")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--emit-final"],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            print(out.stdout + out.stderr, flush=True)
            raise SystemExit("highest-precision reference trajectory failed")
        ref = json.loads(out.stdout.strip().splitlines()[-1])

    losses = run_trajectory()
    first5 = float(np.mean(losses[:5]))
    last5 = float(np.mean(losses[-5:]))
    if "--emit-final" in sys.argv:
        print(json.dumps({"first5": first5, "last5": last5}), flush=True)
        return 0
    print("first5:", [f"{l:.4f}" for l in losses[:5]], flush=True)
    print("last5:", [f"{l:.4f}" for l in losses[-5:]], flush=True)
    assert np.all(np.isfinite(losses)), "non-finite losses"
    assert last5 < first5 - 0.01, "loss did not descend"
    print("CONVERGENCE OK", flush=True)

    if ref is None:
        return 0
    gap = last5 - ref["last5"]
    print(f"gate: default last5={last5:.4f} highest last5={ref['last5']:.4f} "
          f"gap={gap:+.4f} (band {GATE_BAND})", flush=True)
    assert gap <= GATE_BAND, (
        f"default-precision trajectory converges {gap:.4f} WORSE than the "
        f"exact-arithmetic reference (band {GATE_BAND}) — a precision rung is "
        "degrading convergence"
    )
    print("NUMERICS GATE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
