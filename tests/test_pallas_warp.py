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


class TestAdaptiveBand:
    """Banded hat matmuls (band=64) vs the unbanded kernel on a full-size canvas.

    Exercises both in-kernel paths: mild crops take the banded branch, a strong
    perspective draw exceeds the span bound and falls back to the full matmul."""

    def _setup(self):
        import numpy as np
        from pixray_tpu.engine import cutouts as C
        from pixray_tpu.ops import warp as W

        rng = np.random.default_rng(3)
        work = jnp.asarray(rng.random((224, 398, 3)), jnp.float32)
        # mild crop (banded path), strong perspective (fallback), off-canvas zoom
        m_crop = W.random_resized_crop(jax.random.PRNGKey(1), 224, 398, 224)
        m_persp = W.mm3(
            W.random_perspective(jax.random.PRNGKey(2), 224, 398, 0.4), m_crop
        )
        m_out = W.crop_box_transform(
            jnp.float32(300.0), jnp.float32(-40.0), jnp.float32(200.0),
            jnp.float32(280.0), 224, 224,
        )
        ms = jnp.stack([m_crop, m_persp, m_out])
        return work, ms

    @pytest.mark.slow
    @pytest.mark.parametrize("mode", ["border", "fill"])
    def test_band_matches_unbanded(self, mode):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch

        work, ms = self._setup()
        kw = dict(padding_mode=mode, fill_value=0.3, interpret=True,
                  precision="highest", k_tile=4096)
        banded = pallas_warp_batch(work, ms, 224, band=64, **kw)
        unbanded = pallas_warp_batch(work, ms, 224, band=0, **kw)
        np.testing.assert_allclose(
            np.asarray(banded), np.asarray(unbanded), atol=1e-4
        )

    @pytest.mark.slow
    def test_band_gradient_matches(self):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch

        work, ms = self._setup()
        g_out = jnp.asarray(
            np.random.default_rng(4).random((3, 224, 224, 3)), jnp.float32
        )

        def loss(band):
            def f(wk):
                out = pallas_warp_batch(
                    wk, ms, 224, padding_mode="border", interpret=True,
                    precision="highest", k_tile=4096, band=band,
                )
                return jnp.sum(out * g_out)
            return np.asarray(jax.grad(f)(work))

        np.testing.assert_allclose(loss(64), loss(0), atol=1e-3, rtol=1e-2)


class TestMultiModeKernel:
    """Unified mixed-mode chunked kernel vs the XLA modes path.

    5 matrices over modes {reflection, border, zeros} with a fill composite on
    two of them — also exercises the N_CHUNK padding path (5 -> 8)."""

    def _setup(self):
        rng = np.random.default_rng(7)
        work = jnp.asarray(rng.random((20, 28, 3)), jnp.float32)
        ms = random_matrices()  # (3, 3, 3)
        ms = jnp.concatenate([ms, ms[:2] * 1.05], axis=0)  # (5, 3, 3)
        modes = jnp.asarray([0, 1, 2, 2, 1], jnp.int32)
        fill_mask = jnp.asarray([False, False, True, True, False])
        return work, ms, modes, fill_mask

    def test_forward_matches_xla(self):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch_modes
        from pixray_tpu.ops.warp_batch import warp_batch_modes

        work, ms, modes, fill_mask = self._setup()
        fast = pallas_warp_batch_modes(
            work, ms, modes, 16, fill_value=0.4, fill_mask=fill_mask,
            interpret=True, precision="highest", n_chunk=8,
        )
        ref = warp_batch_modes(work, ms, modes, 16, fill_value=0.4, fill_mask=fill_mask)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)

    def test_gradient_matches_xla(self):
        from pixray_tpu.ops.pallas_warp import pallas_warp_batch_modes
        from pixray_tpu.ops.warp_batch import warp_batch_modes

        work, ms, modes, fill_mask = self._setup()
        g_out = jnp.asarray(np.random.default_rng(8).random((5, 16, 16, 3)), jnp.float32)

        def loss(fn):
            def f(wk):
                out = fn(wk)
                return jnp.sum(out * g_out)
            return np.asarray(jax.grad(f)(work))

        g_fast = loss(lambda wk: pallas_warp_batch_modes(
            wk, ms, modes, 16, fill_value=0.4, fill_mask=fill_mask,
            interpret=True, precision="highest", n_chunk=8))
        g_ref = loss(lambda wk: warp_batch_modes(
            wk, ms, modes, 16, fill_value=0.4, fill_mask=fill_mask))
        np.testing.assert_allclose(g_fast, g_ref, atol=1e-3, rtol=1e-2)

    def test_matches_per_mode_calls(self):
        """The unified bank equals separate single-mode warp_batch calls."""
        from pixray_tpu.ops.warp_batch import warp_batch, warp_batch_modes

        work, ms, modes, fill_mask = self._setup()
        uni = np.asarray(
            warp_batch_modes(work, ms, modes, 16, fill_value=0.4, fill_mask=fill_mask)
        )
        singles = [
            warp_batch(work, ms[0:1], 16, padding_mode="reflection"),
            warp_batch(work, ms[1:2], 16, padding_mode="border"),
            warp_batch(work, ms[2:3], 16, padding_mode="fill", fill_value=0.4),
            warp_batch(work, ms[3:4], 16, padding_mode="fill", fill_value=0.4),
            warp_batch(work, ms[4:5], 16, padding_mode="border"),
        ]
        ref = np.concatenate([np.asarray(s) for s in singles], axis=0)
        np.testing.assert_allclose(uni, ref, atol=1e-4)


@pytest.mark.slow
def test_multi_band_matches_unbanded():
    """Banded unified kernel == unbanded on a full-size canvas, mixed modes."""
    from pixray_tpu.engine import cutouts as C
    from pixray_tpu.ops import warp as W
    from pixray_tpu.ops.pallas_warp import pallas_warp_batch_modes

    rng = np.random.default_rng(11)
    work = jnp.asarray(rng.random((224, 398, 3)), jnp.float32)
    m_crop = W.random_resized_crop(jax.random.PRNGKey(1), 224, 398, 224)
    m_persp = W.mm3(W.random_perspective(jax.random.PRNGKey(2), 224, 398, 0.4), m_crop)
    m_out = W.crop_box_transform(
        jnp.float32(300.0), jnp.float32(-40.0), jnp.float32(200.0),
        jnp.float32(280.0), 224, 224,
    )
    ms = jnp.stack([m_crop, m_persp, m_out])
    modes = jnp.asarray([0, 1, 2], jnp.int32)
    fill_mask = jnp.asarray([False, False, True])
    kw = dict(fill_value=0.3, fill_mask=fill_mask, interpret=True,
              precision="highest", k_tile=4096, n_chunk=4)
    banded = pallas_warp_batch_modes(work, ms, modes, 224, band=64, **kw)
    unbanded = pallas_warp_batch_modes(work, ms, modes, 224, band=0, **kw)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(unbanded), atol=1e-4)

    g_out = jnp.asarray(np.random.default_rng(12).random((3, 224, 224, 3)), jnp.float32)

    def grad_of(band):
        def f(wk):
            return jnp.sum(pallas_warp_batch_modes(wk, ms, modes, 224, band=band, **kw) * g_out)
        return np.asarray(jax.grad(f)(work))

    np.testing.assert_allclose(grad_of(64), grad_of(0), atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_int8_backward_rung(monkeypatch):
    """The opt-in int8 banded backward (PIXRAY_TPU_WARP_BWD_PREC=int8) stays
    within the same error envelope as the accepted bf16 backward: both are
    dominated by the int8 FORWARD's quantization of the loss surface, so the
    dx rung must add (near) nothing on top."""
    import pixray_tpu.ops.pallas_warp as PW
    from pixray_tpu.ops import warp as W
    from pixray_tpu.ops.pallas_warp import pallas_warp_batch_modes

    rng = np.random.default_rng(21)
    work = jnp.asarray(rng.random((224, 398, 3)), jnp.float32)
    m_crop = W.random_resized_crop(jax.random.PRNGKey(5), 224, 398, 224)
    m_persp = W.mm3(W.random_perspective(jax.random.PRNGKey(6), 224, 398, 0.3), m_crop)
    ms = jnp.stack([m_crop, m_persp])
    modes = jnp.asarray([0, 1], jnp.int32)
    g_out = jnp.asarray(np.random.default_rng(22).random((2, 224, 224, 3)), jnp.float32)
    kw = dict(interpret=True, k_tile=4096, n_chunk=4, band=64)

    def grad_of(prec):
        def f(wk):
            return jnp.sum(
                pallas_warp_batch_modes(wk, ms, modes, 224, precision=prec, **kw) * g_out
            )
        return np.asarray(jax.grad(f)(work))

    g_exact = grad_of("highest")
    g_bf16bwd = grad_of("int8")  # int8 fwd, bf16 bwd (the r4 default)
    monkeypatch.setattr(PW, "WARP_BWD_PREC", "int8")
    g_int8bwd = grad_of("int8")  # int8 fwd AND int8 dx bwd

    scale = np.abs(g_exact).max() + 1e-12
    err_bf16 = np.abs(g_bf16bwd - g_exact).max() / scale
    err_int8 = np.abs(g_int8bwd - g_exact).max() / scale
    # the dx rung may add at most ~1.5e-2 of max-grad on top of the fwd error
    assert err_int8 < err_bf16 + 1.5e-2, (err_int8, err_bf16)
    # and the int8-bwd gradient must still correlate with the exact one
    cos = float(
        (g_int8bwd * g_exact).sum()
        / (np.linalg.norm(g_int8bwd) * np.linalg.norm(g_exact) + 1e-12)
    )
    assert cos > 0.995, cos
