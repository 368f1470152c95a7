import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from pixray_tpu.ops import warp as W
from pixray_tpu.ops.pallas_warp import pallas_warp_batch_modes

dev = jax.devices()[0]
print("device:", dev)
rng = np.random.default_rng(0)
work = jnp.asarray(rng.random((224, 224, 3)), jnp.float32)
N = 48
keys = jax.random.split(jax.random.PRNGKey(0), N)
ms = []
for i in range(N):
    k1, k2 = jax.random.split(keys[i])
    p = W.random_perspective(k1, 224, 224, 0.40)
    m = W.mm3(W.random_resized_crop(k2, 224, 224, 224, scale=(0.25, 0.95), ratio=(0.85, 1.2)), p)
    ms.append(m)
ms = jnp.stack(ms)
modes = jnp.asarray([0]*29 + [2]*19, jnp.int32)
g = jnp.asarray(rng.random((N, 224, 224, 3)), jnp.float32)

def run(band, prec):
    def f(wk):
        out = pallas_warp_batch_modes(wk, ms, modes, 224, band=band, precision=prec)
        return jnp.sum(out * g), out
    vg = jax.jit(jax.value_and_grad(f, has_aux=True))
    (v, out), gr = vg(work); jax.block_until_ready(gr)
    t0 = time.perf_counter()
    R = 20
    for _ in range(R):
        (v, out), gr = vg(work)
    jax.block_until_ready(gr)
    dt = (time.perf_counter() - t0) / R * 1e3
    return dt, np.asarray(out), np.asarray(gr)

base_dt, base_out, base_gr = run(0, None)
print(f"band=0   (prec default): {base_dt:7.2f} ms fwd+bwd")
for band in (32, 64, 96, 128):
    try:
        dt, out, gr = run(band, None)
        err_o = np.max(np.abs(out - base_out)); err_g = np.max(np.abs(gr - base_gr))
        print(f"band={band:<4}: {dt:7.2f} ms  max|dout|={err_o:.3e} max|dgrad|={err_g:.3e}")
    except Exception as e:
        print(f"band={band}: FAIL {type(e).__name__}: {str(e)[:300]}")
