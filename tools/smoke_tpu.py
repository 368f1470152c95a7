"""On-hardware convergence smoke + numerics gate, parametric over bench configs.

Two checks (run manually on TPU, and invoked by bench.py before it publishes):

1. **Descent**: N optimizer steps must strictly reduce the CLIP-prompt loss.
2. **Precision-ladder gate**: the DEFAULT kernel-precision trajectory's final
   loss must land within a band of the exact-arithmetic reference trajectory
   (``PIXRAY_TPU_WARP_PREC=highest``; for clipdraw additionally
   ``PIXRAY_TPU_PALLAS=0`` so the strokes kernel is measured against the XLA
   renderer).  Run as a subprocess because the precision defaults bind at
   kernel import.  A future precision rung (int8/bf16 quantization, banding,
   layout change) that quietly degrades convergence fails this gate instead of
   shipping; matching the reference's determinism hooks
   (/root/reference/pixray.py:589-606, 1776) in spirit — seeded runs are
   reproducible, so the band only needs to cover legitimate rounding-induced
   trajectory divergence, not run-to-run noise.

Usage:
    python tools/smoke_tpu.py                       # flagship descent + gate
    python tools/smoke_tpu.py --config clipdraw     # clipdraw descent + gate
    python tools/smoke_tpu.py --no-gate             # descent only
    python tools/smoke_tpu.py --emit-final          # final-loss JSON (gate helper)
    python tools/smoke_tpu.py --steps 25            # trajectory length
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

# the default-vs-exact final-loss band: the exact reference re-runs the same
# seeded trajectory with exact f32 warp matmuls (and XLA strokes for clipdraw);
# divergence beyond this is a real numerics regression, not rounding drift
# (measured default-vs-highest gap ~0.01-0.03 on v5e at 60 steps)
GATE_BAND = float(os.environ.get("PIXRAY_TPU_SMOKE_BAND", "0.08"))
STEPS = int(os.environ.get("PIXRAY_TPU_SMOKE_STEPS", "60"))

# env layers that turn a default run into the exact-arithmetic reference for a
# given config (the subprocess' kernels bind these at import).  Every
# precision rung that has a default-on fast path is pinned to its exact
# setting here — warp matmuls to f32, CLIP matmuls to bf16 compute with f32
# weight refs and f32 LayerNorm — so the gate measures the full ladder.
_EXACT_COMMON = {
    "PIXRAY_TPU_WARP_PREC": "highest",
    "PIXRAY_TPU_CLIP_PREC": "bf16",
    "PIXRAY_TPU_CLIP_W16": "0",
    "PIXRAY_TPU_CLIP_LN32": "1",
}
EXACT_ENV = {
    "pixel": dict(_EXACT_COMMON),
    "clipdraw": dict(_EXACT_COMMON, PIXRAY_TPU_PALLAS="0"),
}


def bench_settings(config: str, steps: int):
    """The BASELINE.md config's settings, shared with bench.py (single source)."""
    from bench import _COMMON, CONFIGS

    return dict(_COMMON, iterations=steps + 40, **CONFIGS[config])


def run_trajectory(config: str = "pixel", steps: int = STEPS):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from pixray_tpu.config import apply_settings
    from pixray_tpu.engine.core import Engine

    settings = apply_settings(bench_settings(config, steps), apply_side_effects=False)
    e = Engine(settings)
    losses = []
    for it in range(steps):
        e.train(it)
        losses.append(float(np.asarray(e.last_loss_values).sum()))
    return losses


def main():
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="pixel")
    p.add_argument("--steps", type=int, default=STEPS)
    p.add_argument("--no-gate", action="store_true")
    p.add_argument("--emit-final", action="store_true")
    args = p.parse_args()

    ref = None
    if not args.emit_final and not args.no_gate:
        # the chip is a single EXCLUSIVE-access device: the reference
        # subprocess must run (and exit) BEFORE this process creates its TPU
        # client, or it blocks forever waiting for the device
        env = dict(os.environ, **EXACT_ENV.get(args.config, EXACT_ENV["pixel"]))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--emit-final",
             "--config", args.config, "--steps", str(args.steps)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            print(out.stdout + out.stderr, flush=True)
            raise SystemExit("exact-precision reference trajectory failed")
        ref = json.loads(out.stdout.strip().splitlines()[-1])

    losses = run_trajectory(args.config, args.steps)
    first5 = float(np.mean(losses[:5]))
    last5 = float(np.mean(losses[-5:]))
    if args.emit_final:
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
    print(f"gate[{args.config}]: default last5={last5:.4f} exact last5="
          f"{ref['last5']:.4f} gap={gap:+.4f} (band {GATE_BAND})", flush=True)
    assert gap <= GATE_BAND, (
        f"default-precision trajectory converges {gap:.4f} WORSE than the "
        f"exact-arithmetic reference (band {GATE_BAND}) — a precision rung is "
        "degrading convergence"
    )
    print("NUMERICS GATE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
