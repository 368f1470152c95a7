"""Loss/filter plug-in tests: jit-safety, gradient flow, and golden values for the
analytic losses (reference semantics from /root/reference/Losses/*)."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def toy_inputs(h=24, w=32, s=16, n=3):
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    cutouts = {s: jnp.asarray(rng.random((n, s, s, 3)), jnp.float32)}
    return out, cutouts


def run_loss(loss_obj, args, out=None, cutouts=None, globals_=None):
    if out is None:
        out, cutouts = toy_inputs()
    got = loss_obj.get_loss(cutouts, out, args, globals=globals_ or {"cur_iteration": 0}, lossGlobals={}, key=KEY)
    if isinstance(got, (list, tuple)):
        got = sum(got)
    return got


class TestSymmetry:
    def test_symmetric_image_zero(self):
        from pixray_tpu.losses.symmetry import SymmetryLoss

        out = jnp.ones((8, 8, 3)) * 0.3
        loss = run_loss(SymmetryLoss(), SimpleNamespace(symmetry_weight=1.0), out, {})
        assert float(loss) == 0.0

    def test_asymmetric_positive_and_differentiable(self):
        from pixray_tpu.losses.symmetry import SymmetryLoss

        args = SimpleNamespace(symmetry_weight=2.0)
        out, cuts = toy_inputs()
        loss_obj = SymmetryLoss()
        g = jax.grad(lambda o: run_loss(loss_obj, args, o, cuts))(out)
        assert float(run_loss(loss_obj, args, out, cuts)) > 0
        assert jnp.any(g != 0)


class TestPalette:
    def test_exact_palette_zero(self):
        from pixray_tpu.losses.palette import PaletteLoss

        pal = [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
        args = SimpleNamespace(palette=pal, palette_weight=1.0)
        loss_obj = PaletteLoss(SimpleNamespace(palette=pal))
        cuts = {16: jnp.zeros((2, 16, 16, 3))}
        loss = run_loss(loss_obj, args, jnp.zeros((8, 8, 3)), cuts)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_off_palette_positive(self):
        from pixray_tpu.losses.palette import PaletteLoss

        pal = [[0.0, 0.0, 0.0]]
        args = SimpleNamespace(palette=pal, palette_weight=1.0)
        loss_obj = PaletteLoss(SimpleNamespace(palette=pal))
        cuts = {16: jnp.ones((2, 16, 16, 3)) * 0.5}
        loss = float(run_loss(loss_obj, args, jnp.zeros((8, 8, 3)), cuts))
        # norm(0.5,0.5,0.5)=0.866; *2 cutouts /10
        assert loss == pytest.approx(0.866 * 2 / 10, abs=1e-3)


class TestSaturation:
    def test_gray_has_zero_colorfulness(self):
        from pixray_tpu.losses.saturation import SaturationLoss

        args = SimpleNamespace(saturation_weight=1.0)
        cuts = {16: jnp.ones((2, 16, 16, 3)) * 0.5}
        loss = float(run_loss(SaturationLoss(), args, jnp.zeros((4, 4, 3)), cuts))
        assert loss == pytest.approx(0.0, abs=1e-6)

    def test_colorful_negative(self):
        from pixray_tpu.losses.saturation import SaturationLoss

        args = SimpleNamespace(saturation_weight=1.0)
        out, cuts = toy_inputs()
        assert float(run_loss(SaturationLoss(), args, out, cuts)) < 0


class TestSmoothness:
    def args(self, **kw):
        base = dict(
            smoothness_weight=1.0, smoothness_type="default",
            smoothness_gaussian_kernel=0, smoothness_gaussian_std=1.0,
            smoothness_spacing=1, smoothness_edge_order=1,
        )
        base.update(kw)
        return SimpleNamespace(**base)

    def test_flat_zero(self):
        from pixray_tpu.losses.smoothness import SmoothnessLoss

        cuts = {16: jnp.ones((1, 16, 16, 3)) * 0.7}
        assert float(run_loss(SmoothnessLoss(), self.args(), jnp.zeros((4, 4, 3)), cuts)) == 0.0

    def test_matches_torch_gradient(self):
        torch = pytest.importorskip("torch")
        from pixray_tpu.losses.smoothness import SmoothnessLoss

        rng = np.random.default_rng(1)
        arr = rng.random((2, 12, 12, 3)).astype(np.float32)
        cuts = {12: jnp.asarray(arr)}
        ours = float(run_loss(SmoothnessLoss(), self.args(), jnp.zeros((4, 4, 3)), cuts))

        t = torch.from_numpy(arr.transpose(0, 3, 1, 2))  # NCHW like reference
        _pixels = t.permute(0, 2, 3, 1).reshape(-1, 12, 3)
        gyr, gxr = torch.gradient(_pixels[:, :, 0], spacing=1, edge_order=1)
        gyg, gxg = torch.gradient(_pixels[:, :, 1], spacing=1, edge_order=1)
        gyb, gxb = torch.gradient(_pixels[:, :, 2], spacing=1, edge_order=1)
        sharp = torch.sqrt(gyr**2 + gxr**2 + gyg**2 + gxg**2 + gyb**2 + gxb**2)
        theirs = float(sharp.mean())
        assert ours == pytest.approx(theirs, rel=1e-4)

    def test_blur_and_log_variants(self):
        from pixray_tpu.losses.smoothness import SmoothnessLoss

        out, cuts = toy_inputs()
        for variant in ({"smoothness_type": "log"}, {"smoothness_type": "clipped"},
                        {"smoothness_gaussian_kernel": 3}):
            loss = run_loss(SmoothnessLoss(), self.args(**variant), out, cuts)
            assert jnp.isfinite(loss)


class TestEdge:
    def test_white_image_white_edges_zero(self):
        from pixray_tpu.losses.edge import EdgeLoss

        s = SimpleNamespace(edge_color="mat:white", edge_thickness=10, edge_margins=None,
                            edge_input_image="", edge_mask_image="")
        args = SimpleNamespace(edge_color_weight=1.0, global_color_weight=0.0)
        loss_obj = EdgeLoss(s)
        out = jnp.ones((20, 30, 3))
        assert float(run_loss(loss_obj, args, out, {})) == pytest.approx(0.0, abs=1e-6)

    def test_dark_image_penalized(self):
        from pixray_tpu.losses.edge import EdgeLoss

        s = SimpleNamespace(edge_color="mat:white", edge_thickness=10, edge_margins=None,
                            edge_input_image="", edge_mask_image="")
        args = SimpleNamespace(edge_color_weight=1.0, global_color_weight=0.05)
        out = jnp.zeros((20, 30, 3))
        assert float(run_loss(EdgeLoss(s), args, out, {})) > 0


class TestGaussian:
    def test_runs_and_differentiable(self):
        from pixray_tpu.losses.gaussian import GaussianLoss

        args = SimpleNamespace(gaussian_weight=1.0, gaussian_std=(4.0, 4.0),
                               gaussian_color=(255, 255, 255))
        out, cuts = toy_inputs()
        g = jax.grad(lambda o: run_loss(GaussianLoss(), args, o, cuts))(out)
        assert jnp.any(g != 0)


class TestAesthetic:
    def test_uses_embeds_global(self):
        from pixray_tpu.losses.aesthetic import AestheticLoss

        loss_obj = AestheticLoss(None)
        args = SimpleNamespace(aesthetic_target=10.0)
        embeds = jnp.asarray(np.random.default_rng(0).random((4, 512)), jnp.float32)
        loss = loss_obj.get_loss({}, jnp.zeros((4, 4, 3)), args,
                                 globals={"embeds": embeds}, lossGlobals={})
        # zero head → rating 0, target 10 → 100*0.02
        assert float(loss) == pytest.approx(2.0, abs=1e-5)


class TestStyle:
    def test_strotss_runs_tiny(self, tmp_path):
        from PIL import Image

        from pixray_tpu.losses.style import StyleLoss

        style_file = tmp_path / "style.png"
        rng = np.random.default_rng(0)
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(style_file)

        s = SimpleNamespace(style_file=str(style_file))
        loss_obj = StyleLoss(s)
        args = SimpleNamespace(styleloss_content_weight=32.0, styleloss_ospace="uniform",
                               styleloss_skip=0, styleloss_every=1)
        out = jnp.asarray(rng.random((40, 40, 3)), jnp.float32)

        def f(o):
            return loss_obj.get_loss({}, o, args, globals={"cur_iteration": jnp.asarray(5)},
                                     lossGlobals={}, key=KEY)

        loss, g = jax.value_and_grad(f)(out)
        assert jnp.isfinite(loss)
        assert jnp.any(g != 0)

    def test_skip_schedule(self, tmp_path):
        from PIL import Image

        from pixray_tpu.losses.style import StyleLoss

        style_file = tmp_path / "style.png"
        Image.new("RGB", (48, 48), (10, 200, 30)).save(style_file)
        loss_obj = StyleLoss(SimpleNamespace(style_file=str(style_file)))
        args = SimpleNamespace(styleloss_content_weight=32.0, styleloss_ospace="uniform",
                               styleloss_skip=100, styleloss_every=1)
        out = jnp.ones((40, 40, 3)) * 0.5
        loss = loss_obj.get_loss({}, out, args, globals={"cur_iteration": jnp.asarray(5)},
                                 lossGlobals={}, key=KEY)
        assert float(loss) == 0.0


class TestResmem:
    def test_runs_and_differentiable(self):
        from pixray_tpu.losses.resmem import ResmemLoss

        loss_obj = ResmemLoss(None)
        args = SimpleNamespace(resmem_weight=1.0)
        cuts = {224: jnp.ones((2, 64, 64, 3)) * 0.5}

        def f(c):
            return loss_obj.get_loss({224: c}, jnp.zeros((4, 4, 3)), args,
                                     globals={"cur_iteration": 0}, lossGlobals={}, key=KEY)

        loss, g = jax.value_and_grad(f)(cuts[224])
        assert jnp.isfinite(loss)
        assert jnp.any(g != 0)


class TestFilters:
    def test_tiler_preserves_content(self):
        from pixray_tpu.filters.tiler import TilerFilter

        out, _ = toy_inputs()
        filt = TilerFilter(SimpleNamespace())
        rolled, loss = filt(out, KEY)
        assert float(loss) == 0.0
        assert jnp.sum(rolled) == pytest.approx(float(jnp.sum(out)), rel=1e-5)

    def test_lookup_snaps_colors(self):
        from pixray_tpu.filters.lookup import ColorLookup

        pal = [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
        filt = ColorLookup(SimpleNamespace(lookup_beta=10.0, palette=pal))
        img = jnp.ones((8, 8, 3)) * 0.9
        snapped, loss = filt(img, KEY)
        assert jnp.allclose(snapped, 1.0)
        assert float(loss) > 0

    def test_lookup_gradient_straight_through(self):
        from pixray_tpu.filters.lookup import ColorLookup

        pal = [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
        filt = ColorLookup(SimpleNamespace(lookup_beta=10.0, palette=pal))

        def f(img):
            snapped, loss = filt(img, KEY)
            return jnp.sum(snapped) + loss

        g = jax.grad(f)(jnp.ones((4, 4, 3)) * 0.4)
        assert jnp.any(g != 0)

    def test_wallpaper_shift_doubles_rows(self):
        from pixray_tpu.filters.wallpaper import WallpaperFilter

        filt = WallpaperFilter(SimpleNamespace(wallpaper_type="shift", wallpaper_edge_match=0))
        out, _ = toy_inputs(h=10, w=16)
        shifted, loss = filt(out, KEY)
        assert shifted.shape == (20, 16, 3)

    def test_wallpaper_edge_match_loss(self):
        from pixray_tpu.filters.wallpaper import WallpaperFilter

        filt = WallpaperFilter(SimpleNamespace(wallpaper_type="horizontal", wallpaper_edge_match=4))
        out, _ = toy_inputs(h=10, w=16)
        trimmed, loss = filt(out, KEY)
        assert trimmed.shape == (10, 12, 3)
        assert float(loss) > 0
