"""Dynamically-quantized int8 matmul with a bf16 straight-through backward.

The CLIP tower is the hard floor of the step (BENCH_NOTES round-4: fwd+bwd
~9.5 ms of 18.9 at the bf16 matmul roofline), so the next rate rung is the
int8 MXU path — v5e executes s8xs8->s32 dots at ~2x the bf16 rate.  This is
the same precision argument already made (and gated) for the warp kernel's
int8 forward (ops/pallas_warp.py): symmetric dynamic quantization error is
~0.4% per matmul, an order below the engine's noise_fac=0.1 forward noise,
and the bench's precision-ladder gate (tools/smoke_tpu.py) enforces that the
default precision converges within a band of exact arithmetic every round.

Design:
- activations quantize PER ROW (token) with a dynamic absmax scale — computed
  in f32, fused by XLA into the producing elementwise chain;
- weights quantize PER COLUMN (output feature) — frozen perceptor weights, so
  XLA constant-folds... no: weights arrive as step ARGUMENTS (refs), so the
  weight quantize runs per step; it is O(D*F) elementwise against the
  O(rows*D*F) matmul it feeds, negligible at the cutout-bank row counts
  (>=3200 rows);
- backward is the straight-through bf16 estimator: dx = g @ W^T at bf16 with
  f32 accumulation, exactly the bf16 path's gradient.  The cotangent wrt the
  weights is also defined (bf16) but the perceptors are frozen — the engine
  differentiates only the latent, so that branch is dead code XLA eliminates.

Reference match: the torch reference runs CLIP in fp16 on GPU
(/root/reference/pixray.py:633-640 loads eval()-mode perceptors); this is the
TPU-native equivalent decision taken one precision rung further, with a gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _quantize_rows(x32, eps=1e-8):
    """Symmetric per-row int8 quantization of the LAST axis."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), eps) / 127.0
    q = jnp.round(x32 / s).astype(jnp.int8)
    return q, s


@jax.custom_vjp
def int8_matmul(x, w):
    """x (..., D) @ w (D, F) with an int8 forward and bf16 backward.

    Returns f32 (matching preferred_element_type=f32 of the bf16 path)."""
    out, _ = _int8_matmul_fwd(x, w)
    return out


def _int8_matmul_fwd(x, w):
    xq, sx = _quantize_rows(x.astype(jnp.float32))
    # per-column weight scale: quantize along D (axis 0)
    w32 = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.round(w32 / sw).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw
    return out, (x, w)


def _int8_matmul_bwd(res, g):
    x, w = res
    gb = g.astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        gb, w.astype(jnp.bfloat16), (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # weight cotangent (frozen in the engine -> DCE'd); contract all leading axes
    batch_axes = tuple(range(g.ndim - 1))
    dw = jax.lax.dot_general(
        x.astype(jnp.bfloat16), gb, ((batch_axes, batch_axes), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)
