"""Pallas fused warp kernel vs the XLA warp_batch reference (interpret mode).

precision="highest" is the exact mode (tight tolerance); "bf16" is the default
TPU fast path whose quantization error must stay well under the noise_fac=0.1
augmentation noise the engine adds downstream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixray_tpu.ops.warp_batch import warp_batch
from tests.test_warp_batch import random_matrices

# (precision, fwd atol, bwd atol); the fast tier runs the exact mode on every
# padding mode plus the default bf16 mode on two; the rest runs in the slow tier
PRECS = [("highest", 1e-4, 1e-3), ("bf16", 2e-2, 2e-2), ("high", 1e-3, 2e-3)]
FAST = {("highest", m) for m in ["zeros", "border", "reflection", "fill"]} | {
    ("bf16", "border"), ("bf16", "fill"),
}


def _params():
    out = []
    for prec, fa, ba in PRECS:
        for mode in ["zeros", "border", "reflection", "fill"]:
            marks = [] if (prec, mode) in FAST else [pytest.mark.slow]
            out.append(pytest.param(mode, prec, fa, ba, marks=marks))
    return out


@pytest.fixture(scope="module")
def work():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((20, 28, 3)), jnp.float32)


@pytest.mark.parametrize("mode,prec,fwd_atol,bwd_atol", _params())
class TestPallasWarp:
    def test_forward_matches(self, work, mode, prec, fwd_atol, bwd_atol):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch

        ms = random_matrices()
        fast = pallas_warp_batch(work, ms, 16, padding_mode=mode, fill_value=0.4,
                                 interpret=True, precision=prec)
        ref = warp_batch(work, ms, 16, padding_mode=mode, fill_value=0.4)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=fwd_atol)

    def test_backward_matches(self, work, mode, prec, fwd_atol, bwd_atol):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch

        ms = random_matrices()
        g_out = jnp.asarray(np.random.default_rng(1).random((3, 16, 16, 3)), jnp.float32)

        def loss_pallas(wk):
            return jnp.sum(pallas_warp_batch(wk, ms, 16, padding_mode=mode, fill_value=0.4,
                                             interpret=True, precision=prec) * g_out)

        def loss_ref(wk):
            return jnp.sum(warp_batch(wk, ms, 16, padding_mode=mode, fill_value=0.4) * g_out)

        g_fast = np.asarray(jax.grad(loss_pallas)(work))
        g_ref = np.asarray(jax.grad(loss_ref)(work))
        np.testing.assert_allclose(g_fast, g_ref, atol=bwd_atol, rtol=1e-2)
