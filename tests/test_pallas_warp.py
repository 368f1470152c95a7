"""Pallas fused warp kernel vs the XLA warp_batch reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixray_tpu.ops.warp_batch import warp_batch
from tests.test_warp_batch import random_matrices


@pytest.fixture(scope="module")
def work():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((20, 28, 3)), jnp.float32)


@pytest.mark.parametrize("mode", ["zeros", "border", "reflection", "fill"])
class TestPallasWarp:
    def test_forward_matches(self, work, mode):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch

        ms = random_matrices()
        fast = pallas_warp_batch(work, ms, 16, padding_mode=mode, fill_value=0.4, interpret=True)
        ref = warp_batch(work, ms, 16, padding_mode=mode, fill_value=0.4)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)

    def test_backward_matches(self, work, mode):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch

        ms = random_matrices()
        g_out = jnp.asarray(np.random.default_rng(1).random((3, 16, 16, 3)), jnp.float32)

        def loss_pallas(wk):
            return jnp.sum(pallas_warp_batch(wk, ms, 16, padding_mode=mode, fill_value=0.4, interpret=True) * g_out)

        def loss_ref(wk):
            return jnp.sum(warp_batch(wk, ms, 16, padding_mode=mode, fill_value=0.4) * g_out)

        g_fast = np.asarray(jax.grad(loss_pallas)(work))
        g_ref = np.asarray(jax.grad(loss_ref)(work))
        np.testing.assert_allclose(g_fast, g_ref, atol=1e-3, rtol=1e-2)
