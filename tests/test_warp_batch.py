"""warp_batch correctness: forward equals the reference gather path and the
matmul adjoint equals autodiff-of-gather gradients, for every padding mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixray_tpu.ops import warp as W
from pixray_tpu.ops.warp_batch import warp_batch

KEY = jax.random.PRNGKey(3)


def random_matrices(n=3):
    keys = jax.random.split(KEY, n)
    ms = []
    for i, k in enumerate(keys):
        k1, k2 = jax.random.split(k)
        persp = W.random_perspective(k1, 20, 28, 0.3)
        crop = W.random_resized_crop(k2, 20, 28, 16, scale=(0.3, 0.9))
        ms.append(crop @ persp)
    return jnp.stack(ms)


@pytest.fixture(scope="module")
def work():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((20, 28, 3)), jnp.float32)


@pytest.mark.parametrize("mode", ["zeros", "border", "reflection", "fill"])
class TestWarpBatch:
    def test_forward_matches_reference(self, work, mode):
        ms = random_matrices()
        fast = warp_batch(work, ms, 16, padding_mode=mode, fill_value=0.4)
        ref = jnp.stack(
            [
                W.warp_perspective(work, ms[i], (16, 16), padding_mode=mode, fill_value=0.4)
                for i in range(ms.shape[0])
            ]
        )
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)

    def test_adjoint_matches_autodiff(self, work, mode):
        ms = random_matrices()
        g_out = jnp.asarray(
            np.random.default_rng(1).random((3, 16, 16, 3)), jnp.float32
        )

        def fast_loss(wk):
            return jnp.sum(warp_batch(wk, ms, 16, padding_mode=mode, fill_value=0.4) * g_out)

        def ref_loss(wk):
            ref = jnp.stack(
                [
                    W.warp_perspective(wk, ms[i], (16, 16), padding_mode=mode, fill_value=0.4)
                    for i in range(ms.shape[0])
                ]
            )
            return jnp.sum(ref * g_out)

        g_fast = jax.grad(fast_loss)(work)
        g_ref = jax.grad(ref_loss)(work)
        # the custom adjoint runs its matmuls in bf16 (MXU); ~0.4% relative noise
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=2e-2, rtol=2e-2)
        # direction must match tightly
        gf, gr = np.asarray(g_fast).ravel(), np.asarray(g_ref).ravel()
        cos = gf @ gr / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-12)
        assert cos > 0.9999
