"""Experiment: plain-XLA int8 dense matmul rate vs bf16 on the attached TPU.

Decides whether the CLIP forward should run dynamically-quantized int8 dots
(the warp kernel's int8 is a Pallas kernel; CLIP's matmuls would be plain XLA
dot_generals).  Chained, same-process, scalar-pulled (BENCH_NOTES round-2
methodology).  Three ladders:

  bf16:       x@w in bf16, f32 accum (the current CLIP path)
  int8_static: pre-quantized x and w (pure MXU rate ceiling)
  int8_dyn:   per-row dynamic quantize of x in-chain + dequant (the real
              CLIP forward shape: quantize activations, weights pre-quantized)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 20
# ViT-B/32 cutout-bank shape: rows = 64 cuts x 50 tokens = 3200, D=768, F=3072
R, D, F = 3200, 768, 3072


def timeit(fn, *args):
    float(fn(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, D), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, F), jnp.bfloat16)
    wq = jnp.round(w.astype(jnp.float32) * 16).astype(jnp.int8)
    xq = jnp.round(x.astype(jnp.float32) * 16).astype(jnp.int8)
    w_back = jax.random.normal(jax.random.PRNGKey(2), (F, D), jnp.bfloat16)
    wq_back = jnp.round(w_back.astype(jnp.float32) * 16).astype(jnp.int8)

    @jax.jit
    def chain_bf16(x, w, w_back):
        for _ in range(N):
            h = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = (jnp.dot(h.astype(jnp.bfloat16), w_back,
                         preferred_element_type=jnp.float32) * 1e-3).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def chain_int8_static(xq, wq, wq_back):
        acc = None
        for _ in range(N):
            h = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            hq = (h >> 8).astype(jnp.int8)
            acc = jax.lax.dot_general(hq, wq_back, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            xq = (acc >> 8).astype(jnp.int8)
        return jnp.sum(acc.astype(jnp.float32))

    @jax.jit
    def chain_int8_dyn(x, wq, wq_back):
        for _ in range(N):
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
            h = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            hf = h.astype(jnp.float32) * sx
            sh = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-6) / 127.0
            hq = jnp.round(hf / sh).astype(jnp.int8)
            a = jax.lax.dot_general(hq, wq_back, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            x = (a.astype(jnp.float32) * sh * 1e-4).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2 * N * 2 * R * D * F
    for name, fn, args in [
        ("bf16", chain_bf16, (x, w, w_back)),
        ("int8_static", chain_int8_static, (xq, wq, wq_back)),
        ("int8_dyn", chain_int8_dyn, (x, wq, wq_back)),
    ]:
        t = timeit(fn, *args)
        print(f"{name:12s}: {t * 1e3:8.2f} ms  {flops / t / 1e12:6.1f} T(FL)OP/s",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
