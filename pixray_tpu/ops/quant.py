"""Dynamically-quantized int8 matmul with bf16 or int8 straight-through backward.

The CLIP tower is the hard floor of the step (BENCH_NOTES round-4: fwd+bwd
~9.5 ms of 18.9 at the bf16 matmul roofline), so the next rate rung is the
int8 MXU path — v5e executes s8xs8->s32 dots above the bf16 rate (measured
+5% whole-step on the flagship for the forward alone).  This is the same
precision argument already made (and gated) for the warp kernel's int8
forward (ops/pallas_warp.py): symmetric dynamic quantization error is ~0.4%
per matmul, an order below the engine's noise_fac=0.1 forward noise, and the
bench's precision-ladder gate (tools/smoke_tpu.py) enforces that the default
precision converges within a band of exact arithmetic every round.

Design:
- activations quantize PER ROW (token) with a dynamic absmax scale — computed
  in f32, fused by XLA into the producing elementwise chain;
- weights quantize PER COLUMN (output feature).  The perceptor weights arrive
  as step ARGUMENTS (refs), so the weight quantize runs per dispatch; it is
  O(D*F) elementwise against the O(rows*D*F) matmul it feeds — negligible at
  the cutout-bank row counts (>=3200 rows);
- backward ``bwd='bf16'``: the straight-through bf16 estimator
  dx = g @ W^T at bf16 with f32 accumulation — exactly the bf16 path's
  gradient;
- backward ``bwd='int8'``: dx runs the same dynamic-quantization scheme on
  (g, W^T) — 2x the forward's FLOPs live in this dot, so it is the larger
  half of the rate win; gradient quantization is gated by the same
  precision-ladder check;
- the cotangent wrt the weights is also defined (bf16) but the perceptors
  are frozen — the engine differentiates only the latent, so that branch is
  dead code XLA eliminates.

Reference match: the torch reference runs CLIP in fp16 on GPU
(/root/reference/pixray.py:633-640 loads eval()-mode perceptors); this is the
TPU-native equivalent decision taken one precision rung further, with a gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _quantize_last_axis(x32, eps=1e-8):
    """Symmetric per-row int8 quantization along the LAST axis."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), eps) / 127.0
    q = jnp.round(x32 / s).astype(jnp.int8)
    return q, s


def _int8_dot(x, w):
    """(..., D) x (D, F) via the int8 MXU with dynamic scales; returns f32."""
    xq, sx = _quantize_last_axis(x.astype(jnp.float32))
    w32 = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.round(w32 / sw).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_matmul(x, w, bwd="bf16"):
    """x (..., D) @ w (D, F) with an int8 forward and bf16/int8 backward.

    Returns f32 (matching preferred_element_type=f32 of the bf16 path)."""
    return _int8_dot(x, w)


def _int8_matmul_fwd(x, w, bwd):
    return _int8_dot(x, w), (x, w)


def _int8_matmul_bwd(bwd, res, g):
    x, w = res
    if bwd == "int8":
        dx = _int8_dot(g, w.astype(jnp.float32).T).astype(x.dtype)
    else:
        dx = jax.lax.dot_general(
            g.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((g.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    # weight cotangent (frozen in the engine -> DCE'd); contract all leading axes
    batch_axes = tuple(range(g.ndim - 1))
    dw = jax.lax.dot_general(
        x.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        ((batch_axes, batch_axes), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# --------------------------------------------------------------- pre-quantized
# The dynamic path re-quantizes the (frozen) weights INSIDE the step — and the
# blocked dispatch's lax.scan carries them in bf16, so XLA's loop-invariant
# code motion provably does NOT hoist the weight quantize (the compiled while
# carry holds bf16[768,3072] etc. and the body re-derives s8 every iteration).
# At ViT-B/32 scale that is ~0.5 GB/step of avoidable HBM traffic: read bf16 W
# + write s8 + read s8, twice (forward and dx backward).  Pre-quantizing ONCE
# at perceptor load (models/perceptor.py) carries the weights as s8 refs and
# the step only quantizes activations.


def prequantize_kernel(w):
    """Symmetric per-column (output-feature) int8 quantization of a (D, F)
    kernel; returns ``(wq s8[D,F], sw f32[1,F])`` with ``wq * sw ≈ w``.

    Bitwise-identical scheme to the dynamic path's weight quantize, so
    swapping paths changes nothing numerically for equal input weights."""
    w32 = jnp.asarray(w, jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.round(w32 / sw).astype(jnp.int8)
    return wq, sw


def _int8_dot_pre(x, wq, sw):
    xq, sx = _quantize_last_axis(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_matmul_pre(x, wq, sw, bwd="bf16"):
    """x (..., D) @ (wq * sw) with pre-quantized weights (prequantize_kernel).

    Forward quantizes activations only.  Backward folds sw into the cotangent
    so the SAME s8 weight block serves the dx dot:
    dx[..., d] = Σ_f g[..., f]·sw[f]·wq[d, f] — with ``bwd='int8'`` the folded
    cotangent is dynamically quantized per row (the int8b rung); wq itself
    contributes no further quantization error in either mode.  Weights are
    frozen in the engine (no wq/sw cotangent flows anywhere)."""
    return _int8_dot_pre(x, wq, sw)


def _int8_matmul_pre_fwd(x, wq, sw, bwd):
    return _int8_dot_pre(x, wq, sw), (jnp.zeros((0,), x.dtype), wq, sw)


def _int8_matmul_pre_bwd(bwd, res, g):
    import numpy as np
    from jax import dtypes

    xtok, wq, sw = res
    gs = g.astype(jnp.float32) * sw  # fold per-column weight scales into g
    if bwd == "int8":
        gq, sg = _quantize_last_axis(gs)
        acc = jax.lax.dot_general(
            gq, wq, (((g.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dx = (acc.astype(jnp.float32) * sg).astype(xtok.dtype)
    else:
        dx = jax.lax.dot_general(
            gs.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            (((g.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xtok.dtype)
    # int8 primals take float0 cotangents; frozen weights — both are dead
    return dx, np.zeros(wq.shape, dtypes.float0), jnp.zeros_like(sw)


int8_matmul_pre.defvjp(_int8_matmul_pre_fwd, _int8_matmul_pre_bwd)
