"""Drawer tests: geometry, rendering, gradients, SVG export, engine integration."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def make_settings(**kw):
    base = dict(size=[64, 36], transparent=False, pixel_size=None, pixel_scale=None)
    base.update(kw)
    return SimpleNamespace(**base)


class TestPixelDrawer:
    def make(self, **kw):
        from pixray_tpu.drawers.pixel import PixelDrawer

        settings = make_settings(
            pixel_type=kw.pop("pixel_type", "rect"),
            pixel_edge_check=kw.pop("pixel_edge_check", True),
            pixel_iso_check=kw.pop("pixel_iso_check", True),
            **kw,
        )
        d = PixelDrawer(settings)
        d.snap_canvas(settings.size)
        return d

    def test_rect_render_matches_grid(self):
        d = self.make(pixel_size=[8, 6])
        z = d.init_params(KEY)
        img = d.synth(d.model_params, z, 0)
        assert img.shape == (36, 64, 4)
        # rect cells tile exactly: each canvas pixel alpha = 1
        assert jnp.allclose(img[..., 3], 1.0, atol=1e-5)
        # center of cell (0,0) must be exactly color 0
        np.testing.assert_allclose(np.asarray(img[2, 3, :3]), np.asarray(z[0, :3]), atol=1e-5)

    def test_separable_matches_gather_path(self):
        """The rect grid's factorized matmul render (composite_cells_separable)
        must match the generic gather+composite path in value AND gradient."""
        from pixray_tpu.ops.cellrender import (
            build_coverage_map,
            build_inverse_map,
            composite_cells,
            composite_cells_separable,
            try_separable_operators,
        )

        d = self.make(pixel_size=[8, 6])
        assert "sep_row_op" in d.model_params  # rect grid auto-detects
        z = d.init_params(jax.random.PRNGKey(3))
        z = z.at[:, 3].set(jax.random.uniform(jax.random.PRNGKey(4), (z.shape[0],)))
        indices, valid = build_coverage_map(d.polygons, d.canvas_width, d.canvas_height)
        inv = build_inverse_map(indices, valid, d.num_cells)

        def f_sep(z):
            return composite_cells_separable(
                z, d.model_params["sep_row_op"], d.model_params["sep_col_op"],
                d.num_rows, d.num_cols)

        def f_gather(z):
            return composite_cells(
                z, jnp.asarray(indices), jnp.asarray(valid),
                d.canvas_height, d.canvas_width,
                inverse_map=(jnp.asarray(inv[0]), jnp.asarray(inv[1])))

        np.testing.assert_allclose(np.asarray(f_sep(z)), np.asarray(f_gather(z)),
                                   atol=1e-5)
        g_sep = jax.grad(lambda z: jnp.sum(f_sep(z) ** 2))(z)
        g_gat = jax.grad(lambda z: jnp.sum(f_gather(z) ** 2))(z)
        np.testing.assert_allclose(np.asarray(g_sep), np.asarray(g_gat),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("ptype", ["rect", "rectshift", "hex", "tri", "diamond", "knit"])
    def test_all_geometries_render_and_grad(self, ptype):
        d = self.make(pixel_type=ptype, pixel_size=[10, 8])
        z = d.init_params(KEY)

        def f(z):
            return jnp.sum(d.synth(d.model_params, z, 0) ** 2)

        g = jax.grad(f)(z)
        assert jnp.all(jnp.isfinite(g))
        # nearly all cells should receive gradient
        touched = jnp.sum(jnp.any(g[:, :3] != 0, axis=1))
        assert touched > 0.5 * z.shape[0]

    def test_params_from_image(self):
        d = self.make(pixel_size=[8, 6])
        img = jnp.ones((36, 64, 3)) * jnp.asarray([1.0, -1.0, 0.0])  # [-1,1] space
        z = d.params_from_image(img)
        np.testing.assert_allclose(np.asarray(z[:, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z[:, 1]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z[:, 2]), 0.5, atol=1e-5)

    def test_edge_parity_fixups(self):
        d = self.make(pixel_type="hex")  # shift type: odd rows/cols enforced
        assert d.num_cols % 2 == 1
        assert d.num_rows % 2 == 1

    def test_svg_export(self):
        d = self.make(pixel_size=[4, 3])
        z = d.init_params(KEY)
        svg = d.to_svg(z)
        assert svg.startswith("<svg")
        assert svg.count("<polygon") == d.num_cells

    def test_clip_params_alpha_locked_when_opaque(self):
        d = self.make(pixel_size=[4, 3])
        z = d.init_params(KEY) - 0.7
        clipped = d.clip_params(z)
        assert jnp.all(clipped[:, 3] == 1.0)
        assert float(jnp.min(clipped[:, :3])) >= 0.0


class TestFftDrawer:
    def make(self, fft_use="fft", fft_wave="haar"):
        from pixray_tpu.drawers.fft import FftDrawer

        settings = make_settings(
            fft_use=fft_use, fft_decay=1.5, fft_wave=fft_wave, fft_sharp=0.3,
            fft_colors=1.5, fft_lrate=0.3,
        )
        d = FftDrawer(settings)
        d.snap_canvas(settings.size)
        return d

    @pytest.mark.parametrize("mode", ["fft", "dwt", "pixel"])
    def test_modes_render_and_grad(self, mode):
        d = self.make(mode)
        z = d.init_params(KEY)
        img = d.synth(d.model_params, z, 0)
        assert img.shape == (36, 64, 3)
        assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0

        def f(z):
            return jnp.sum(d.synth(d.model_params, z, 0))

        g = jax.grad(f)(z)
        assert all(jnp.any(leaf != 0) for leaf in jax.tree_util.tree_leaves(g))

    @pytest.mark.parametrize("mode", ["fft", "dwt", "pixel"])
    def test_image_roundtrip(self, mode):
        d = self.make(mode)
        rng = np.random.default_rng(0)
        target01 = np.clip(rng.random((36, 64, 3)).astype(np.float32), 0.05, 0.95)
        z = d.params_from_image(jnp.asarray(target01) * 2 - 1)
        recon = np.asarray(d.synth(d.model_params, z, 0))
        assert np.abs(recon - target01).mean() < 0.05

    @pytest.mark.parametrize("wave", ["coif2", "db4"])
    def test_dwt_nonhaar_roundtrip(self, wave):
        # the reference's default wavelet is coif2 (fftdrawer.py:19); the
        # orthogonal-matmul filter bank must reconstruct exactly
        d = self.make("dwt", fft_wave=wave)
        rng = np.random.default_rng(1)
        target01 = np.clip(rng.random((36, 64, 3)).astype(np.float32), 0.05, 0.95)
        z = d.params_from_image(jnp.asarray(target01) * 2 - 1)
        recon = np.asarray(d.synth(d.model_params, z, 0))
        assert np.abs(recon - target01).mean() < 0.05

        g = jax.grad(lambda z: jnp.sum(d.synth(d.model_params, z, 0)))(z)
        assert all(jnp.any(leaf != 0) for leaf in jax.tree_util.tree_leaves(g))

    def test_dwt_haar_matches_butterfly(self):
        # the general filter bank with the haar filter must reproduce the
        # classic (a±b±c±d)/2 butterfly bit-for-bit conventions
        from pixray_tpu.drawers.fft import dwt2
        from pixray_tpu.ops.wavelets import analysis_matrix, wavelet_filter

        a8 = jnp.asarray(analysis_matrix(8, wavelet_filter("haar")), jnp.float32)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 8, 8)), jnp.float32)
        ll, (lh, hl, hh) = dwt2(x, a8, a8)
        a, b = x[:, 0::2, 0::2], x[:, 0::2, 1::2]
        c, dd = x[:, 1::2, 0::2], x[:, 1::2, 1::2]
        np.testing.assert_allclose(np.asarray(ll), np.asarray((a + b + c + dd) / 2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lh), np.asarray((a - b + c - dd) / 2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hl), np.asarray((a + b - c - dd) / 2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hh), np.asarray((a - b - c + dd) / 2), atol=1e-5)

    def test_unknown_wavelet_raises(self):
        with pytest.raises(ValueError, match="not supported"):
            self.make("dwt", fft_wave="nosuchwave")


class TestStrokeDrawers:
    def test_clipdraw_renders_and_grads(self):
        from pixray_tpu.drawers.clipdraw import ClipDrawer

        settings = make_settings(strokes=8, min_stroke_width=1, max_stroke_width=5)
        d = ClipDrawer(settings)
        d.snap_canvas(settings.size)
        z = d.init_params(KEY)
        img = d.synth(d.model_params, z, 0)
        assert img.shape == (36, 64, 3)

        def f(z):
            return jnp.sum(d.synth(d.model_params, z, 0) ** 2)

        g = jax.grad(f)(z)
        assert jnp.any(g["points"] != 0), "geometry must receive gradients"
        assert jnp.any(g["widths"] != 0)
        assert jnp.any(g["colors"] != 0)

    def test_clipdraw_svg(self):
        from pixray_tpu.drawers.clipdraw import ClipDrawer

        settings = make_settings(strokes=4, min_stroke_width=1, max_stroke_width=5)
        d = ClipDrawer(settings)
        d.snap_canvas(settings.size)
        z = d.init_params(KEY)
        svg = d.to_svg(z)
        assert svg.count("<path") == 4

    def test_line_sketch_paper_background(self):
        from pixray_tpu.drawers.line_sketch import LineDrawer

        settings = make_settings(
            strokes=3, stroke_length=4, min_stroke_width=0.5,
            max_stroke_width=2, allow_paper_color=False,
        )
        d = LineDrawer(settings)
        d.snap_canvas(settings.size)
        z = d.init_params(KEY)
        img = np.asarray(d.synth(d.model_params, z, 0))
        # corners should be paper-colored (strokes start centered)
        assert img[0, 0] == pytest.approx([242 / 255, 238 / 255, 203 / 255], abs=0.02)

    def test_line_width_clamp(self):
        from pixray_tpu.drawers.line_sketch import LineDrawer

        settings = make_settings(
            strokes=3, stroke_length=4, min_stroke_width=0.5,
            max_stroke_width=2, allow_paper_color=False,
        )
        d = LineDrawer(settings)
        d.snap_canvas(settings.size)
        z = d.init_params(KEY)
        z["widths"] = z["widths"] * 100
        clipped = d.clip_params(z)
        assert float(jnp.max(clipped["widths"])) <= d.max_width + 1e-6


class TestStrokeRasterizer:
    def test_coverage_of_straight_line(self):
        from pixray_tpu.ops.strokes import stroke_coverage

        # horizontal line through the middle of a 16x32 canvas, width 4
        samples = jnp.asarray([[4.0, 8.0], [28.0, 8.0]])
        cov = stroke_coverage(samples, jnp.asarray(4.0), 16, 32)
        assert float(cov[8, 16]) == 1.0  # on the line
        assert float(cov[0, 16]) == 0.0  # far away
        assert float(cov[8, 0]) == 0.0  # beyond the round end cap

    def test_over_compositing_order(self):
        from pixray_tpu.ops.strokes import render_strokes, bezier_basis

        # two overlapping opaque horizontal strokes; the later one must win
        basis = bezier_basis([1, 1], 1, samples_per_segment=4)
        pts = np.zeros((2, 4, 2), np.float32)
        for i in range(2):
            for j in range(4):
                pts[i, j] = [j * 10.0, 8.0]
        colors = jnp.asarray([[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0]])
        widths = jnp.asarray([6.0, 6.0])
        bg = jnp.zeros((16, 32, 3))
        out = render_strokes(jnp.asarray(pts), widths, colors, basis, 16, 32, bg)
        # center pixel covered by both → painter order: green (drawn later) wins
        assert float(out[8, 15, 1]) > 0.9
        assert float(out[8, 15, 0]) < 0.1
