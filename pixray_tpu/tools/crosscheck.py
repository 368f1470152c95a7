"""On-hardware numerical crosscheck: Pallas fused warp vs the XLA reference path.

Interpret-mode tests can pass while Mosaic lowering is wrong; run this ON THE
TARGET ACCELERATOR before enabling PIXRAY_TPU_PALLAS:

    python -m pixray_tpu.tools.crosscheck

Covers the single-mode kernel at "highest" precision (exact audit), the default
bf16 precision (loose bound, must stay far below the engine's noise_fac=0.1),
and the unified mixed-mode chunked kernel the engine actually dispatches.

Exit code 0 = kernels match (enable the Pallas default); nonzero = mismatch.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.ops import warp as W
from pixray_tpu.ops.pallas_warp import pallas_warp_batch, pallas_warp_batch_modes
from pixray_tpu.ops.warp_batch import warp_batch, warp_batch_modes


def main() -> int:
    rng = np.random.default_rng(0)
    work = jnp.asarray(rng.random((224, 597, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    ms = []
    for i in range(8):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        ms.append(
            W.random_resized_crop(k2, 224, 597, 224) @ W.random_perspective(k1, 224, 597, 0.4)
        )
    ms = jnp.stack(ms)
    g_out = jnp.asarray(rng.random((8, 224, 224, 3)), jnp.float32)

    ok = True
    for prec, fwd_tol, bwd_tol in [("highest", 1e-3, 5e-2), ("bf16", 2e-2, 5e-2)]:
        for mode in ["reflection", "border", "fill", "zeros"]:
            a = jax.jit(lambda w: pallas_warp_batch(w, ms, 224, mode, 0.5, precision=prec))(work)
            b = jax.jit(lambda w: warp_batch(w, ms, 224, mode, 0.5))(work)
            diff = float(jnp.abs(a - b).max())
            print(f"[{prec}] {mode} fwd maxdiff: {diff:.2e}")
            ok &= diff < fwd_tol

        for mode in ["reflection", "fill"]:
            ga = jax.jit(jax.grad(lambda w: jnp.sum(
                pallas_warp_batch(w, ms, 224, mode, 0.5, precision=prec) * g_out)))(work)
            gb = jax.jit(jax.grad(lambda w: jnp.sum(warp_batch(w, ms, 224, mode, 0.5) * g_out)))(work)
            rel = float(jnp.abs(ga - gb).max() / (jnp.abs(gb).max() + 1e-8))
            print(f"[{prec}] {mode} bwd max rel diff: {rel:.2e}")
            ok &= rel < bwd_tol

    # the unified mixed-mode chunked kernel (the engine's actual dispatch path)
    modes = jnp.asarray([0, 1, 2, 2, 0, 1, 2, 1], jnp.int32)
    fill_mask = modes == 2
    a = jax.jit(lambda w: pallas_warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask))(work)
    b = jax.jit(lambda w: warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask))(work)
    diff = float(jnp.abs(a - b).max())
    print(f"[default] mixed-mode fwd maxdiff: {diff:.2e}")
    ok &= diff < 2e-2

    # the int8 MXU forward (default on TPU since round 3): symmetric 8-bit
    # quantization bounds the forward error at ~1% of the canvas range — an
    # order below the engine's noise_fac=0.1; backward stays bf16 (exact
    # match with the bf16-prec gradient is asserted by the [default] bwd
    # check below running at WARP_PREC's value)
    a8 = jax.jit(lambda w: pallas_warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask,
        precision="int8"))(work)
    diff8 = float(jnp.abs(a8 - b).max())
    print(f"[int8] mixed-mode fwd maxdiff: {diff8:.2e}")
    ok &= diff8 < 3e-2

    ga = jax.jit(jax.grad(lambda w: jnp.sum(pallas_warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask) * g_out)))(work)
    gb = jax.jit(jax.grad(lambda w: jnp.sum(warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask) * g_out)))(work)
    rel = float(jnp.abs(ga - gb).max() / (jnp.abs(gb).max() + 1e-8))
    print(f"[default] mixed-mode bwd max rel diff: {rel:.2e}")
    ok &= rel < 5e-2

    ok &= check_strokes()

    print("CROSSCHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def check_strokes() -> bool:
    """Fused Pallas stroke rasterizer vs the XLA scan path (fwd + all grads)."""
    from pixray_tpu.ops.pallas_strokes import render_strokes_fused
    from pixray_tpu.ops.strokes import bezier_basis, render_strokes

    rng = np.random.default_rng(1)
    n, max_seg, h, w = 48, 3, 216, 384
    basis = bezier_basis(rng.integers(1, max_seg + 1, n), max_seg)
    v = 1 + 3 * max_seg
    pts = jnp.asarray(rng.uniform(-10, [w + 10, h + 10], (n, v, 2)), jnp.float32)
    widths = jnp.asarray(rng.uniform(1.0, 9.0, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 4)), jnp.float32)
    bg = jnp.ones((h, w, 3), jnp.float32)
    probe = jnp.asarray(rng.standard_normal((h, w, 4)), jnp.float32)

    ok = True
    a = jax.jit(lambda p: render_strokes_fused(p, widths, colors, basis, h, w, bg))(pts)
    b = jax.jit(lambda p: render_strokes(p, widths, colors, basis, h, w, bg))(pts)
    diff = float(jnp.abs(a - b).max())
    print(f"[strokes] fwd maxdiff: {diff:.2e}")
    ok &= diff < 1e-3

    def loss(render):
        return lambda p, wd, c: jnp.sum(render(p, wd, c, basis, h, w, bg) * probe)

    ga = jax.jit(jax.grad(loss(
        lambda *t: render_strokes_fused(*t)), argnums=(0, 1, 2)))(pts, widths, colors)
    gb = jax.jit(jax.grad(loss(
        lambda *t: render_strokes(*t)), argnums=(0, 1, 2)))(pts, widths, colors)
    for name, x, y in zip(["dpoints", "dwidths", "dcolors"], ga, gb):
        rel = float(jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-8))
        print(f"[strokes] {name} max rel diff: {rel:.2e}")
        ok &= rel < 5e-3
    return ok


if __name__ == "__main__":
    sys.exit(main())
