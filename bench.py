#!/usr/bin/env python
"""Benchmark: optimizer steps/sec on the BASELINE.json configs.

Headline metric — config #1: pixel drawer + CLIP ViT-B/32, prompt "sunrise",
80x45 grid (384x216 canvas), 64 cutouts — the north-star configuration
("optimizer steps/sec at 64 cutouts").  The JSON line also carries a
``configs`` map with the other BASELINE configs, each measured end-to-end
through the same engine and matching BASELINE.md's definitions:

- ``fft``        Fourier-feature implicit image @ 256², ViT-B/32
- ``vqgan``      ImageNet-f16 VQGAN latents with the multi-CLIP ensemble the
                 blueprint names (ViT-B/32 + ViT-B/16)
- ``vqgan_1clip``same with one perceptor (kept for cross-round comparability)
- ``clipdraw``   1024 Bézier strokes (own precision-ladder gate, see below)
- ``vdiff``      CLIP-guided v-diffusion sampling; ``vdiff_esrgan4x_s`` is the
                 one-shot Real-ESRGAN 4× upscale pass (256²→1024²) wall-clock
                 that completes that BASELINE config
- ``pixel_supreme`` the reference supreme preset's 8 cuts × 4 batches
                 (gradient accumulation as lax.scan)

The reference publishes no numbers (BASELINE.md); ``REF_BASELINE_STEPS_PER_SEC``
is a documented analytic estimate of the torch reference on an A100 for the
flagship config (derivation with arithmetic: BASELINE.md "vs_baseline
denominator").  The JSON carries ``baseline_basis: analytic-estimate`` so the
ratio cannot be mistaken for a measured one.  The BASELINE.json north-star asks
for ≥20x.

Gates before publishing (PIXRAY_TPU_BENCH_SMOKE=0 skips, e.g. for throughput
A/B sweeps; PIXRAY_TPU_BENCH_CONFIGS=0 skips the non-flagship configs):

1. flagship convergence smoke + precision-ladder numerics gate (the default
   kernel precisions must converge within a band of exact arithmetic);
2. the same ladder for clipdraw (its strokes kernel has its own custom VJP);
3. per-config descent: every benched trajectory must be finite and, except
   vdiff (whose per-step re-noising makes the loss sequence structurally
   non-monotone — each step scores a different diffusion time), descending;
4. the on-TPU sharded-path smoke (tools/tpu_mesh_smoke.py): a 1-device real
   mesh runs the sharded step + sharded-vs-unsharded parity, so the sharding
   code path provably executes on real hardware every round (this repo's
   history has CPU-clean graphs miscompiling on TPU — BUGS.md).

A kernel-precision or sharding regression makes this script exit nonzero
instead of printing a number.

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

REF_BASELINE_STEPS_PER_SEC = 8.0  # analytic A100 estimate — BASELINE.md shows the arithmetic

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

# the five BASELINE.json benchmark configs (BASELINE.md "configs to measure"),
# plus the comparability/preset rows documented in the module docstring
CONFIGS = {
    # 1. pixel drawer + ViT-B/32 @ 80x45 (the README default) — the headline
    "pixel": dict(drawer="pixel", size=[384, 216]),
    # 2. Fourier-feature implicit image vs CLIP at 256x256
    "fft": dict(drawer="fft", size=[256, 256]),
    # 3. ImageNet f16 VQGAN latents + multi-CLIP ensemble (the blueprint's
    #    definition; reference "normal" preset ensemble = ViT-B/32,ViT-B/16)
    "vqgan": dict(drawer="vqgan", size=[384, 216], clip_models="ViT-B/32,ViT-B/16"),
    #    single-perceptor row kept so the decoder cost stays comparable with
    #    the other rows (and with rounds 1-4)
    "vqgan_1clip": dict(drawer="vqgan", size=[384, 216]),
    # 4. differentiable vector strokes
    "clipdraw": dict(drawer="clipdraw", size=[384, 216]),
    # 5. CLIP-guided v-diffusion sampling; the one-shot ESRGAN 4x pass is
    #    published alongside as vdiff_esrgan4x_s (bench_esrgan_once)
    "vdiff": dict(drawer="vdiff", size=[256, 256]),
    # the supreme preset's cutout geometry: 8 cuts x 4 batches — exercises the
    # lax.scan gradient accumulation (/root/reference/pixray.py:1864-1878)
    "pixel_supreme": dict(drawer="pixel", size=[384, 216], num_cuts=8, batches=4),
}

# descent gate policy per benched config ("descent" | "finite")
CONFIG_CHECKS = {
    "pixel": "descent",
    "fft": "descent",
    "vqgan": "descent",
    "vqgan_1clip": "descent",
    "clipdraw": "descent",
    "vdiff": "finite",  # per-step re-noise: loss is structurally non-monotone
    "pixel_supreme": "descent",
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


def bench_esrgan_once():
    """One-shot Real-ESRGAN 4x wall-clock (256²→1024², full 23-block RRDBNet) —
    the post pass that completes BASELINE config #5.  Returns seconds."""
    import jax.numpy as jnp

    from pixray_tpu.models.esrgan import RRDBNet

    model = RRDBNet()
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3))

    # the scalar pull both forces execution (relay block_until_ready returns
    # early — BENCH_NOTES round 2) and avoids timing the 12MB host transfer
    fn = jax.jit(lambda v, x: jnp.sum(model.apply(v, x)))
    float(fn(variables, img))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(variables, img))
        best = min(best, time.perf_counter() - t0)
    return best


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


def _subprocess_gate(cmd, env, what, timeout=3600):
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=timeout)
    if out.returncode != 0:
        print(f"GATE FAILED: {what} crashed", file=sys.stderr)
        print((out.stdout + out.stderr)[-2000:], file=sys.stderr)
        raise SystemExit(1)
    return out.stdout


def run_reference_trajectory(config="pixel", steps=None):
    """Exact-arithmetic reference trajectory for ``config`` in a subprocess;
    returns its final-loss summary dict.

    MUST run before this process touches the TPU: the chip is a single
    exclusive-access device (through the remote relay too), so a subprocess
    spawned while the parent holds a live TPU client blocks forever waiting
    for the device.  The precision defaults also bind at kernel import, which
    is the other reason this is a subprocess at all."""
    from tools.smoke_tpu import EXACT_ENV

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, **EXACT_ENV.get(config, EXACT_ENV["pixel"]))
    cmd = [sys.executable, os.path.join(here, "tools", "smoke_tpu.py"),
           "--emit-final", "--config", config]
    if steps is not None:
        cmd += ["--steps", str(steps)]
    out = _subprocess_gate(cmd, env, f"exact-precision {config} reference run")
    return json.loads(out.strip().splitlines()[-1])


def probe_device(timeout_s):
    """Bounded fail-loud device probe (subprocess, pre-TPU-client).

    The tunneled single-TPU relay can die or stay claim-wedged (BUGS.md round-5
    hazard); a bare jax.devices() then blocks FOREVER, which would hang this
    whole script rather than fail it.  Probing in a subprocess with a hard
    timeout converts that into a nonzero exit with a diagnosis.  The subprocess
    exits immediately after, so no second client lingers on the relay."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print('probe ok:', d)"],
            env=dict(os.environ), capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(
            f"DEVICE PROBE FAILED: jax.devices() did not return within "
            f"{timeout_s}s — the TPU relay is unreachable or claim-wedged "
            "(see BUGS.md round-5 hazard). Refusing to start a bench that "
            "would hang forever.", file=sys.stderr)
        raise SystemExit(1)
    if out.returncode != 0:
        print("DEVICE PROBE FAILED: jax.devices() crashed:", file=sys.stderr)
        print((out.stdout + out.stderr)[-2000:], file=sys.stderr)
        raise SystemExit(1)


def run_mesh_smoke():
    """The on-TPU sharded-path smoke + parity (subprocess, pre-TPU-client)."""
    here = os.path.dirname(os.path.abspath(__file__))
    out = _subprocess_gate(
        [sys.executable, os.path.join(here, "tools", "tpu_mesh_smoke.py")],
        dict(os.environ), "tpu_mesh_smoke (sharded step on real hardware)",
    )
    line = [l for l in out.strip().splitlines() if "tpu_mesh_smoke" in l]
    return line[-1] if line else "ok"


def check_descent(name, losses, mode):
    """Per-config trajectory health over the bench window itself."""
    import numpy as np

    window = np.asarray(losses)
    if not np.all(np.isfinite(window)):
        print(f"SMOKE FAILED [{name}]: non-finite losses in the bench window "
              "— refusing to publish", file=sys.stderr)
        raise SystemExit(1)
    if mode == "finite":
        return
    first5 = float(np.mean(window[:5]))
    last5 = float(np.mean(window[-5:]))
    if not last5 < first5 - 0.005:
        print(f"SMOKE FAILED [{name}]: loss did not descend over the bench "
              f"window (first5={first5:.4f}, last5={last5:.4f}) — refusing to "
              "publish", file=sys.stderr)
        raise SystemExit(1)


def check_precision_gate(name, losses, ref, steps, band):
    """Precision-ladder gate: default-precision final loss within ``band`` of
    the exact-arithmetic reference trajectory (same seed/config/steps)."""
    import numpy as np

    window = losses[:steps]
    last5 = float(np.mean(window[-5:]))
    gap = last5 - ref["last5"]
    if gap > band:
        print(f"NUMERICS GATE FAILED [{name}]: default precision converges "
              f"{gap:.4f} worse than exact arithmetic (band {band}) — "
              "refusing to publish", file=sys.stderr)
        raise SystemExit(1)
    return f"ok (gap {gap:+.4f})"


def main():
    # exclusive-device ordering: every subprocess that needs the chip runs
    # BEFORE this process creates its TPU client (see run_reference_trajectory)
    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    smoke_on = os.environ.get("PIXRAY_TPU_BENCH_SMOKE", "1") == "1"
    configs_on = os.environ.get("PIXRAY_TPU_BENCH_CONFIGS", "1") == "1"
    smoke_steps = int(os.environ.get("PIXRAY_TPU_SMOKE_STEPS", "60"))
    band = float(os.environ.get("PIXRAY_TPU_SMOKE_BAND", "0.08"))
    clipdraw_steps = 9 + 2 * 8  # clipdraw bench warmup+windows cover these
    clipdraw_band = float(os.environ.get("PIXRAY_TPU_SMOKE_BAND_CLIPDRAW", "0.08"))

    note("bounded device probe...")
    probe_device(int(os.environ.get("PIXRAY_TPU_DEVICE_PROBE_TIMEOUT_S", "900")))

    ref = clipdraw_ref = None
    mesh_smoke = "skipped"
    if smoke_on:
        note("on-TPU sharded-path smoke + parity (subprocess)...")
        mesh_smoke = run_mesh_smoke()
        note(mesh_smoke)
        note("exact-precision pixel reference trajectory (subprocess)...")
        ref = run_reference_trajectory("pixel", smoke_steps)
        if configs_on:
            note("exact-precision clipdraw reference trajectory (subprocess)...")
            clipdraw_ref = run_reference_trajectory("clipdraw", clipdraw_steps)

    note("flagship config (pixel)...")
    losses = []
    flagship = bench_config(
        "pixel", CONFIGS["pixel"], WARMUP_STEPS, TIMED_STEPS, 3, losses_sink=losses
    )
    check_descent("pixel", losses[:smoke_steps], "descent")
    smoke = "skipped"
    if ref is not None:
        smoke = check_precision_gate("pixel", losses, ref, smoke_steps, band)
    note(f"flagship {flagship:.2f} steps/s, smoke {smoke}")

    configs = {"pixel": round(flagship, 3)}
    if configs_on:
        for name in ("fft", "vqgan", "vqgan_1clip", "clipdraw", "vdiff",
                     "pixel_supreme"):
            note(f"config {name}...")
            cfg_losses = []
            try:
                configs[name] = round(
                    bench_config(name, CONFIGS[name], 9, 8, 2,
                                 losses_sink=cfg_losses), 3
                )
            except Exception as exc:  # keep the headline metric publishable
                configs[name] = f"error: {type(exc).__name__}: {exc}"[:200]
                note(f"config {name}: {configs[name]}")
                continue
            check_descent(name, cfg_losses, CONFIG_CHECKS[name])
            if name == "clipdraw" and clipdraw_ref is not None:
                gate = check_precision_gate(
                    "clipdraw", cfg_losses, clipdraw_ref, clipdraw_steps,
                    clipdraw_band)
                note(f"clipdraw precision gate {gate}")
            note(f"config {name}: {configs[name]}")
        note("one-shot ESRGAN 4x pass (vdiff post step)...")
        try:
            configs["vdiff_esrgan4x_s"] = round(bench_esrgan_once(), 3)
        except Exception as exc:
            configs["vdiff_esrgan4x_s"] = f"error: {type(exc).__name__}: {exc}"[:200]
        note(f"vdiff_esrgan4x_s: {configs['vdiff_esrgan4x_s']}")

    print(
        json.dumps(
            {
                "metric": "pixel_vitb32_64cuts_steps_per_sec",
                "value": round(flagship, 3),
                "unit": "steps/sec",
                "vs_baseline": round(flagship / REF_BASELINE_STEPS_PER_SEC, 3),
                "baseline_basis": "analytic-estimate",  # BASELINE.md derivation
                "calib_matmul_tflops": round(calibrate_matmul_tflops(), 1),
                "smoke": smoke,
                "mesh_smoke": mesh_smoke,
                "configs": configs,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
