"""Warp-forward kernel microbenchmark: where do 21 ms go (vs the 11.7 ms
MXU-roofline backward)?

Times `_run_fwd_multi` standalone on the flagship shapes (64 cuts, 224^2 out,
224x224x3 work, bf16) and ablated kernel variants:

  asis       — production kernel
  mxu-reduce — the (T,W) cross-lane sum(tmp*b, axis=1) done as an MXU matmul
               against a ones(W, 128) panel (lane reduce -> matmul)
  no-reduce  — out = tmp[:, :128] summed (drops the b multiply + full reduce;
               NOT semantically correct, isolates reduce cost)
  no-hatx    — skips building b entirely (isolates hat_x build cost)

Run on TPU:  python tools/exp8_fwd_kernel.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PIXRAY_TPU_NO_DOWNLOAD", "1")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", _CACHE)

from pixray_tpu.ops import pallas_warp as PW

N, S, H, W, C = 64, 224, 224, 224, 3
K_TILE = PW.K_TILE
N_CHUNK = 8


def make_inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    work = jax.random.uniform(k1, (H, W, C), jnp.float32)
    # plausible cutout homographies: scale 0.2-1.0, small offsets
    sc = jax.random.uniform(k2, (N, 1, 1), minval=0.2, maxval=1.0)
    base = jnp.eye(3)[None] * sc + jax.random.normal(k3, (N, 3, 3)) * 0.01
    base = base.at[:, 2, :2].set(0.0).at[:, 2, 2].set(1.0)
    modes = jnp.concatenate([jnp.zeros((38,), jnp.int32), jnp.full((26,), 2, jnp.int32)])
    return work, base, modes


def variant_kernel(inv_ref, work_ref, out_ref, *, k_tile, out_size, channels,
                   prec, n_chunk, mode):
    h, w = work_ref.shape[1], work_ref.shape[2]
    kt = pl.program_id(1)
    u = jax.lax.broadcasted_iota(jnp.int32, (k_tile, h), 1).astype(jnp.float32)
    v = jax.lax.broadcasted_iota(jnp.int32, (k_tile, w), 1).astype(jnp.float32)
    ones_panel = jnp.ones((w, 128), jnp.float32)
    for s in range(n_chunk):
        sx, sy = PW._chunk_coords(inv_ref, s, kt, k_tile, out_size, h, w)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))
        if mode != "no-hatx":
            b = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v))
        for c in range(channels):
            tmp = PW._mm(a, work_ref[c].astype(jnp.float32), prec)
            if mode == "asis":
                out_ref[s, c, :] = jnp.sum(tmp * b, axis=1)
            elif mode == "mxu-reduce":
                red = PW._mm(tmp * b, ones_panel, prec)  # (T, 128)
                out_ref[s, c, :] = red[:, 0]
            elif mode == "no-reduce":
                out_ref[s, c, :] = (tmp * b)[:, 0]
            elif mode == "no-hatx":
                out_ref[s, c, :] = tmp[:, 0]


def run_variant(work, inv, modes, mode):
    k = S * S
    k_tiles = pl.cdiv(k, K_TILE)
    n_blocks = pl.cdiv(N, N_CHUNK)
    aug = PW._augment_inv(inv, modes)
    kernel = functools.partial(
        variant_kernel, k_tile=K_TILE, out_size=S, channels=C,
        prec="bf16", n_chunk=N_CHUNK, mode=mode,
    )
    work_cm = work.transpose(2, 0, 1)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((N_CHUNK, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, H, W), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_CHUNK, C, K_TILE), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * N_CHUNK, C, k_tiles * K_TILE), jnp.float32),
        compiler_params=PW._compiler_params(),
    )(aug, work_cm)
    return out


def timeit(f, *args, reps=20):
    o = f(*args)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def int8_kernel_T(inv_ref, work_ref, out_ref, *, k_tile, out_size, channels, n_chunk):
    """Transposed fwd with the hat-y contraction on the int8 MXU path:
    work pre-quantized to int8 outside (symmetric, dynamic scale), hats
    quantized in-kernel to round(a*127); dequant scale folded in afterwards."""
    w, h = work_ref.shape[1], work_ref.shape[2]
    kt = pl.program_id(1)
    u_col = jax.lax.broadcasted_iota(jnp.int32, (h, k_tile), 0).astype(jnp.float32)
    v_col = jax.lax.broadcasted_iota(jnp.int32, (w, k_tile), 0).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    for s in range(n_chunk):
        sx, sy = PW._chunk_coords(inv_ref, s, kt, k_tile, out_size, h, w, row=True)
        a_t = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u_col))
        a_q = jnp.round(a_t * 127.0).astype(jnp.int8)
        b_t = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v_col))
        for c in range(channels):
            tmp_i = jax.lax.dot_general(work_ref[c], a_q, dn,
                                        preferred_element_type=jnp.int32)
            out_ref[s, c, :] = jnp.sum(tmp_i.astype(jnp.float32) * b_t, axis=0)


def run_int8_T(work, inv, modes):
    k = S * S
    k_tiles = pl.cdiv(k, K_TILE)
    n_blocks = pl.cdiv(N, N_CHUNK)
    aug = PW._augment_inv(inv, modes)
    s_w = jnp.maximum(jnp.max(jnp.abs(work)), 1e-6)
    work_q = jnp.round(work.transpose(2, 1, 0) / s_w * 127.0).astype(jnp.int8)
    kernel = functools.partial(
        int8_kernel_T, k_tile=K_TILE, out_size=S, channels=C, n_chunk=N_CHUNK)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((N_CHUNK, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, W, H), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_CHUNK, C, K_TILE), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * N_CHUNK, C, k_tiles * K_TILE), jnp.float32),
        compiler_params=PW._compiler_params(),
    )(aug, work_q)
    return out * (s_w / (127.0 * 127.0))


def main():
    work, inv, modes = make_inputs(jax.random.PRNGKey(0))

    prod_t = jax.jit(lambda w: PW._run_fwd_multi_T(w, inv, modes, S, False, K_TILE, "bf16", N_CHUNK))
    print(f"transposed fwd (lanes-T) : {timeit(prod_t, work):8.2f} ms", flush=True)

    i8 = jax.jit(run_int8_T)
    print(f"int8 fwd (lanes-T)       : {timeit(i8, work, inv, modes):8.2f} ms", flush=True)
    ref_t = prod_t(work)
    got = i8(work, inv, modes)
    k = S * S
    got = got[:N, :, :k].transpose(0, 2, 1).reshape(N, S, S, C)
    d = float(jnp.max(jnp.abs(got - ref_t)))
    print(f"  int8-vs-bf16 max|diff|: {d:.3e}", flush=True)

    os.environ["PIXRAY_TPU_WARP_FWDT"] = "0"
    prod = jax.jit(lambda w: PW._run_fwd_multi(w, inv, modes, S, False, K_TILE, "bf16", N_CHUNK, 0))
    print(f"production _run_fwd_multi: {timeit(prod, work):8.2f} ms", flush=True)
    d = float(jnp.max(jnp.abs(prod_t(work) - prod(work))))
    print(f"  T-vs-legacy max|diff|: {d:.3e}", flush=True)
    del os.environ["PIXRAY_TPU_WARP_FWDT"]

    g = jax.random.normal(jax.random.PRNGKey(7), (N, S, S, C), jnp.float32)
    bwd_t = jax.jit(lambda g: PW._run_bwd_multi_T(g, inv, modes, (H, W, C), S, False, K_TILE, "bf16", N_CHUNK))
    print(f"transposed bwd (lanes-T) : {timeit(bwd_t, g):8.2f} ms", flush=True)
    os.environ["PIXRAY_TPU_WARP_BWDT"] = "0"
    bwd = jax.jit(lambda g: PW._run_bwd_multi(g, inv, modes, (H, W, C), S, False, K_TILE, "bf16", N_CHUNK, 0))
    print(f"production _run_bwd_multi: {timeit(bwd, g):8.2f} ms", flush=True)
    db = float(jnp.max(jnp.abs(bwd_t(g) - bwd(g))))
    print(f"  bwdT-vs-legacy max|diff|: {db:.3e}", flush=True)
    del os.environ["PIXRAY_TPU_WARP_BWDT"]

    ref = None
    for mode in ["asis", "mxu-reduce", "no-reduce", "no-hatx"]:
        f = jax.jit(functools.partial(run_variant, mode=mode))
        ms = timeit(f, work, inv, modes)
        print(f"variant {mode:11s}: {ms:8.2f} ms", flush=True)
        if mode == "asis":
            ref = f(work, inv, modes)
        elif mode == "mxu-reduce":
            d = float(jnp.max(jnp.abs(f(work, inv, modes) - ref)))
            print(f"  mxu-reduce max|diff| vs asis: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
