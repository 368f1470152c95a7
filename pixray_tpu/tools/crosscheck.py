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

    ga = jax.jit(jax.grad(lambda w: jnp.sum(pallas_warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask) * g_out)))(work)
    gb = jax.jit(jax.grad(lambda w: jnp.sum(warp_batch_modes(
        w, ms, modes, 224, fill_value=0.5, fill_mask=fill_mask) * g_out)))(work)
    rel = float(jnp.abs(ga - gb).max() / (jnp.abs(gb).max() + 1e-8))
    print(f"[default] mixed-mode bwd max rel diff: {rel:.2e}")
    ok &= rel < 5e-2

    print("CROSSCHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
