"""Micro-benchmark: threefry vs rbg PRNG for the cutout noise draws.

The flagship step draws ~9.6M bf16 normal samples per step (64 cuts x 3 x
224 x 224 additive augmentation noise, engine/cutouts.py:398-438).  Threefry
is a 20-round ALU hash on the VPU; the TPU has a hardware RBG the `rbg`
implementation uses.  This measures the draw (plus a consuming add, so XLA
can't DCE it) at the exact flagship shapes to decide whether an RNG rung is
worth wiring into the engine.

Run on the TPU: python tools/exp17_rng.py

RESULT (v5 lite, 2026-08-19): threefry is effectively free at these shapes —
0.033 ms for the full 9.6M-sample draw vs a 0.021 ms consuming-add floor
(0.012 ms RNG overhead/step ≈ 0.07% of the 17 ms step); the hardware `rbg`
path was *slower* (0.085 ms) because its lowering materializes u32
intermediates.  Conclusion: no RNG rung — the engine keeps threefry, and the
profiler time once attributed to "noise" was really the relayout tail around
the epilogue, which the plane-form epilogue already removed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    shape = (64, 3, 224, 224)  # the flagship noise bank
    base = jnp.zeros(shape, jnp.bfloat16)

    @jax.jit
    def draw_threefry(key, x):
        return x + jax.random.normal(key, x.shape, dtype=x.dtype)

    @jax.jit
    def draw_rbg(key, x):
        return x + jax.random.normal(key, x.shape, dtype=x.dtype)

    @jax.jit
    def draw_threefry_3plane(key, x):
        # the plane-form epilogue's actual pattern: 3 separate HxW draws
        ks = jax.random.split(key, 3)
        return tuple(x[:, c] + jax.random.normal(ks[c], x[:, c].shape, dtype=x.dtype) for c in range(3))

    kt = jax.random.PRNGKey(0)
    kr = jax.random.key(0, impl="rbg")

    t_three = bench(draw_threefry, kt, base)
    t_rbg = bench(draw_rbg, kr, base)
    t_plane = bench(draw_threefry_3plane, kt, base)
    # baseline: the add alone (memory-bound floor for the consuming op)
    @jax.jit
    def floor(x):
        return x + jnp.bfloat16(1.0)
    t_floor = bench(floor, base)

    print(f"threefry normal {shape}: {t_three:.3f} ms")
    print(f"rbg      normal {shape}: {t_rbg:.3f} ms")
    print(f"threefry 3-plane split : {t_plane:.3f} ms")
    print(f"consuming add floor    : {t_floor:.3f} ms")
    print(f"=> rng overhead: threefry {t_three - t_floor:.3f} ms, rbg {t_rbg - t_floor:.3f} ms / step-equivalent")


if __name__ == "__main__":
    main()
