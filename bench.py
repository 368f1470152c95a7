#!/usr/bin/env python
"""Benchmark: optimizer steps/sec on the BASELINE.json configs.

Headline metric — config #1: pixel drawer + CLIP ViT-B/32, prompt "sunrise",
80x45 grid (384x216 canvas), 64 cutouts — the north-star configuration
("optimizer steps/sec at 64 cutouts").  The JSON line also carries a
``configs`` map with the other BASELINE configs (fft / vqgan / clipdraw /
vdiff), each measured end-to-end through the same engine.

The reference publishes no numbers (BASELINE.md); ``REF_BASELINE_STEPS_PER_SEC``
is a documented analytic estimate of the torch reference on an A100 for the
flagship config: ~850 GFLOP of ViT-B/32 fwd+bwd per step at small batch plus
per-cutout kornia augmentation chains and Python dispatch ⇒ ≈8 steps/s.
vs_baseline is measured_steps_per_sec / that estimate (the BASELINE.json
north-star asks for ≥20x).

Before publishing, the convergence smoke + precision-ladder numerics gate
(tools/smoke_tpu.py) must pass: a kernel-precision regression makes this
script exit nonzero instead of printing a number.  PIXRAY_TPU_BENCH_SMOKE=0
skips the gate (e.g. for pure-throughput A/B sweeps); PIXRAY_TPU_BENCH_CONFIGS=0
skips the non-flagship configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# persistent compilation cache: the step graph is large and first-compile is slow
# on remote-compile setups; cache hits make repeated bench runs start instantly
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")  # zero-egress bench environment
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_BASELINE_STEPS_PER_SEC = 8.0  # documented A100 reference estimate (see above)

# warmup/timed aligned to the engine's 8-step dispatch blocks (save_every is
# huge here, so blocks start at iteration 1, 9, 17, …): timing starts exactly at
# a block boundary with an empty consume buffer and covers whole blocks, so
# every timed step is computed inside the timed window.  steps_per_call
# defaults to 0 (blocked, speculative double-buffered) since round 3 — the
# published steps/s therefore measure BLOCKED dispatch, the production default.
WARMUP_STEPS = 9
TIMED_STEPS = 24

_COMMON = dict(
    prompts="sunrise",
    clip_models="ViT-B/32",
    num_cuts=64,
    batches=1,
    save_every=100000,
    display_every=100000,
    init_noise=None,
    vector_prompts="none",
    seed=1,
    outdir="",
    save_intermediates=False,
    learning_rate_drops=[],
)

# the five BASELINE.json benchmark configs (BASELINE.md "configs to measure")
CONFIGS = {
    # 1. pixel drawer + ViT-B/32 @ 80x45 (the README default) — the headline
    "pixel": dict(drawer="pixel", size=[384, 216]),
    # 2. Fourier-feature implicit image vs CLIP at 256x256
    "fft": dict(drawer="fft", size=[256, 256]),
    # 3. ImageNet f16 VQGAN latents (multi-CLIP in the reference preset; the
    #    decoder cost is what distinguishes this config, so one perceptor keeps
    #    the matrix comparable across rows)
    "vqgan": dict(drawer="vqgan", size=[384, 216]),
    # 4. differentiable vector strokes
    "clipdraw": dict(drawer="clipdraw", size=[384, 216]),
    # 5. CLIP-guided v-diffusion sampling (the ESRGAN 4x pass is a one-shot
    #    post step, bench'd implicitly by test_heavy_drawers' tiled parity)
    "vdiff": dict(drawer="vdiff", size=[256, 256]),
}


def bench_config(name, overrides, warmup, timed, windows, losses_sink=None):
    import numpy as np

    from pixray_tpu.config import apply_settings
    from pixray_tpu.engine.core import Engine

    settings = apply_settings(
        dict(_COMMON, iterations=warmup + windows * timed + 16, **overrides),
        apply_side_effects=False,
    )
    engine = Engine(settings)

    def train(it):
        engine.train(it)
        if losses_sink is not None:
            losses_sink.append(float(np.asarray(engine.last_loss_values).sum()))

    for it in range(warmup):
        train(it)
    # best of N windows: the tunneled-relay environment's throughput drifts
    # within a run; the fastest window is the closest to device capability
    best = float("inf")
    it = warmup
    for _ in range(windows):
        t0 = time.perf_counter()
        for it in range(it, it + timed):
            train(it)
        it += 1
        best = min(best, time.perf_counter() - t0)
    return timed / best


def calibrate_matmul_tflops():
    """Same-process hardware calibration: chained bf16 matmul rate.  The
    tunneled relay's effective throughput drifts between runs/hours; this
    field lets cross-round steps/sec comparisons be normalized."""
    import jax.numpy as jnp

    d = 4096
    w = jax.random.normal(jax.random.PRNGKey(0), (d, d), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (d, d), jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        for _ in range(30):
            x = (jnp.dot(x, w, preferred_element_type=jnp.float32) * 1e-2).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    float(chain(x, w))
    tbest = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x, w))
        tbest = min(tbest, time.perf_counter() - t0)
    return 30 * 2 * d**3 / tbest / 1e12


def run_reference_trajectory():
    """Exact-arithmetic reference trajectory (``PIXRAY_TPU_WARP_PREC=highest``)
    in a subprocess; returns its final-loss summary dict.

    MUST run before this process touches the TPU: the chip is a single
    exclusive-access device (through the remote relay too), so a subprocess
    spawned while the parent holds a live TPU client blocks forever waiting
    for the device.  The precision default also binds at kernel import, which
    is the other reason this is a subprocess at all."""
    import json as _json

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, PIXRAY_TPU_WARP_PREC="highest")
    out = subprocess.run(
        [sys.executable, os.path.join(here, "tools", "smoke_tpu.py"), "--emit-final"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        print("NUMERICS GATE FAILED: exact-precision reference run crashed",
              file=sys.stderr)
        print((out.stdout + out.stderr)[-2000:], file=sys.stderr)
        raise SystemExit(1)
    return _json.loads(out.stdout.strip().splitlines()[-1])


def check_smoke_gate(losses, ref):
    """Descent + precision-ladder gate on the flagship trajectory just
    measured; a numerics regression refuses to publish (exit 1).

    The descent check and the default-precision final loss come free from the
    bench engine's own seeded run (same config/seed as tools/smoke_tpu.py);
    ``ref`` is the exact-arithmetic subprocess summary from
    run_reference_trajectory()."""
    import numpy as np

    steps = int(os.environ.get("PIXRAY_TPU_SMOKE_STEPS", "60"))
    band = float(os.environ.get("PIXRAY_TPU_SMOKE_BAND", "0.08"))
    window = losses[:steps]
    first5 = float(np.mean(window[:5]))
    last5 = float(np.mean(window[-5:]))
    if not (np.all(np.isfinite(window)) and last5 < first5 - 0.01):
        print(f"SMOKE FAILED: loss did not descend (first5={first5:.4f}, "
              f"last5={last5:.4f}) — refusing to publish", file=sys.stderr)
        raise SystemExit(1)

    gap = last5 - ref["last5"]
    if gap > band:
        print(f"NUMERICS GATE FAILED: default precision converges {gap:.4f} "
              f"worse than exact arithmetic (band {band}) — refusing to publish",
              file=sys.stderr)
        raise SystemExit(1)
    return f"ok (gap {gap:+.4f})"


def main():
    # exclusive-device ordering: every subprocess that needs the chip runs
    # BEFORE this process creates its TPU client (see run_reference_trajectory)
    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    ref = None
    if os.environ.get("PIXRAY_TPU_BENCH_SMOKE", "1") == "1":
        note("running exact-precision reference trajectory (subprocess)...")
        ref = run_reference_trajectory()

    note("flagship config (pixel)...")
    losses = []
    flagship = bench_config(
        "pixel", CONFIGS["pixel"], WARMUP_STEPS, TIMED_STEPS, 3, losses_sink=losses
    )
    smoke = "skipped"
    if ref is not None:
        smoke = check_smoke_gate(losses, ref)
    note(f"flagship {flagship:.2f} steps/s, smoke {smoke}")

    configs = {"pixel": round(flagship, 3)}
    if os.environ.get("PIXRAY_TPU_BENCH_CONFIGS", "1") == "1":
        for name in ("fft", "vqgan", "clipdraw", "vdiff"):
            note(f"config {name}...")
            try:
                configs[name] = round(
                    bench_config(name, CONFIGS[name], 9, 8, 2), 3
                )
            except Exception as exc:  # keep the headline metric publishable
                configs[name] = f"error: {type(exc).__name__}: {exc}"[:200]
            note(f"config {name}: {configs[name]}")

    print(
        json.dumps(
            {
                "metric": "pixel_vitb32_64cuts_steps_per_sec",
                "value": round(flagship, 3),
                "unit": "steps/sec",
                "vs_baseline": round(flagship / REF_BASELINE_STEPS_PER_SEC, 3),
                "calib_matmul_tflops": round(calibrate_matmul_tflops(), 1),
                "smoke": smoke,
                "configs": configs,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
