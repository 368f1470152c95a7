"""Fused Pallas stroke-rasterizer vs the XLA reference path (interpret mode).

Forward AND all four gradients (points, widths, colors, background) must match
ops/strokes.py::render_strokes — the same contract the warp kernels carry
(reference behavior: diffvg prefiltered rendering, clipdrawer.py:128-138)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixray_tpu.ops.pallas_strokes import render_strokes_fused
from pixray_tpu.ops.strokes import bezier_basis, render_strokes


def _scene(seed, n, max_seg, h, w, spread=10.0):
    rng = np.random.default_rng(seed)
    seg_counts = rng.integers(1, max_seg + 1, n)
    basis = bezier_basis(seg_counts, max_seg, samples_per_segment=8)
    v = 1 + 3 * max_seg
    pts = rng.uniform(-spread, [w + spread, h + spread], (n, v, 2)).astype(np.float32)
    widths = rng.uniform(1.0, 8.0, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    bg = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    return basis, tuple(map(jnp.asarray, (pts, widths, colors, bg)))


class TestFusedStrokes:
    def test_forward_matches_xla_fast(self):
        """Fast-tier forward canary: remainder tiles on BOTH axes (40 % 32,
        140 % 128), multiple stroke chunks with padding (9 strokes, chunk 4).
        The heavier geometries run in the slow tier below."""
        h, w, n, chunk = 40, 140, 9, 4
        basis, (pts, widths, colors, bg) = _scene(0, n, 2, h, w)
        ref = render_strokes(pts, widths, colors, basis, h, w, bg)
        fus = render_strokes_fused(pts, widths, colors, basis, h, w, bg,
                                   interpret=True, chunk=chunk)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("h,w,n,chunk", [
        (72, 140, 21, 8),   # remainder tiles both axes, padded stroke chunk
        (64, 128, 16, 16),  # exact tiles, single chunk
        (40, 96, 3, 4),     # smaller than one tile row
    ])
    def test_forward_matches_xla(self, h, w, n, chunk):
        basis, (pts, widths, colors, bg) = _scene(0, n, 3, h, w)
        ref = render_strokes(pts, widths, colors, basis, h, w, bg)
        fus = render_strokes_fused(pts, widths, colors, basis, h, w, bg,
                                   interpret=True, chunk=chunk)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_xla_fast(self):
        """Fast-tier gradient canary at the small remainder-tile geometry."""
        h, w, n = 40, 140, 9
        basis, args = _scene(0, n, 2, h, w)
        probe = None

        def loss(render):
            def f(p, wd, c, b):
                out = render(p, wd, c, basis, h, w, b)
                return jnp.sum(out * probe)
            return f

        out_shape = (h, w, 4)
        probe = jnp.cos(jnp.arange(int(np.prod(out_shape))).reshape(out_shape) * 0.01)
        fused = lambda p, wd, c, ba, hh, ww, b: render_strokes_fused(
            p, wd, c, ba, hh, ww, b, interpret=True, chunk=4
        )
        g_ref = jax.grad(loss(render_strokes), argnums=(0, 1, 2, 3))(*args)
        g_fus = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(*args)
        for name, a, b in zip(["points", "widths", "colors", "bg"], g_ref, g_fus):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b / scale, a / scale, rtol=2e-4, atol=2e-5,
                                       err_msg=f"gradient mismatch: {name}")

    @pytest.mark.slow
    def test_gradients_match_xla(self):
        h, w, n = 72, 140, 21
        basis, args = _scene(0, n, 3, h, w)
        probe = None

        def loss(render):
            def f(p, wd, c, b):
                out = render(p, wd, c, basis, h, w, b)
                return jnp.sum(out * probe)
            return f

        out_shape = (h, w, 4)
        probe = jnp.cos(jnp.arange(int(np.prod(out_shape))).reshape(out_shape) * 0.01)
        fused = lambda p, wd, c, ba, hh, ww, b: render_strokes_fused(
            p, wd, c, ba, hh, ww, b, interpret=True, chunk=8
        )
        g_ref = jax.grad(loss(render_strokes), argnums=(0, 1, 2, 3))(*args)
        g_fus = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(*args)
        for name, a, b in zip(["points", "widths", "colors", "bg"], g_ref, g_fus):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b / scale, a / scale, rtol=2e-4, atol=2e-5,
                                       err_msg=f"gradient mismatch: {name}")

    def test_offscreen_and_degenerate_strokes(self):
        """Strokes fully off-canvas and zero-length strokes are harmless."""
        h, w = 40, 128
        basis = bezier_basis([1, 1, 1], 1, samples_per_segment=8)
        pts = jnp.asarray(np.stack([
            np.full((4, 2), -500.0),              # far off-canvas
            np.tile(np.array([20.0, 20.0]), (4, 1)),  # zero-length (point)
            np.array([[5, 5], [30, 8], [60, 30], [100, 35]], np.float32),
        ]).astype(np.float32))
        widths = jnp.asarray([3.0, 5.0, 2.0], jnp.float32)
        colors = jnp.asarray([[1, 0, 0, 0.9], [0, 1, 0, 0.8], [0, 0, 1, 0.7]],
                             jnp.float32)
        bg = jnp.ones((h, w, 3), jnp.float32) * 0.5
        ref = render_strokes(pts, widths, colors, basis, h, w, bg)
        fus = render_strokes_fused(pts, widths, colors, basis, h, w, bg,
                                   interpret=True, chunk=2)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_drawer_auto_dispatch_cpu(self):
        """render_strokes_auto routes to the XLA path on CPU (drawer contract)."""
        from pixray_tpu.ops.strokes import render_strokes_auto

        h, w, n = 48, 96, 5
        basis, (pts, widths, colors, bg) = _scene(1, n, 2, h, w)
        auto = render_strokes_auto(pts, widths, colors, basis, h, w, bg)
        ref = render_strokes(pts, widths, colors, basis, h, w, bg)
        np.testing.assert_allclose(np.asarray(auto), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
