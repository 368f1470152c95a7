"""Engine e2e over every drawer family (tiny configs, CPU)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import pixray_tpu as pixray
from tests.test_e2e import tiny_settings


def run_short(tmp_path, **kw):
    pixray.reset_settings()
    pixray.add_settings(**tiny_settings(tmp_path, **kw))
    settings = pixray.apply_settings()
    engine = pixray.do_init(settings)
    engine.train(0)
    engine.train(1)
    assert np.isfinite(np.asarray(engine.last_loss_values)).all()
    return engine


class TestDrawerEngineIntegration:
    def test_pixel(self, tmp_path):
        engine = run_short(tmp_path, drawer="pixel", size=[48, 32], pixel_size=[12, 8])
        svg = engine.drawer.to_svg(engine.z)
        assert "<polygon" in svg

    def test_pixel_transparent(self, tmp_path):
        engine = run_short(
            tmp_path, drawer="pixel", size=[48, 32], pixel_size=[12, 8],
            transparent=True, transparent_weight=0.5,
        )
        assert "transparent" in engine.loss_names
        img = engine.synth_image()
        assert img.mode == "RGBA"

    def test_fft(self, tmp_path):
        run_short(tmp_path, drawer="fft", size=[48, 32])

    def test_fft_dwt(self, tmp_path):
        run_short(tmp_path, drawer="fft", size=[48, 32], fft_use="dwt", fft_wave="haar")

    def test_clipdraw(self, tmp_path):
        engine = run_short(
            tmp_path, drawer="clipdraw", size=[48, 32], strokes=6,
            init_noise=None,
        )
        # multi-group optimizer: widths clamped into range after steps
        w = np.asarray(engine.z["widths"])
        assert (w >= engine.drawer.min_width - 1e-5).all()
        assert "<path" in engine.drawer.to_svg(engine.z)

    def test_line_sketch(self, tmp_path):
        run_short(
            tmp_path, drawer="line_sketch", size=[48, 32], strokes=3,
            stroke_length=3, init_noise=None,
        )

    def test_vqgan_tiny(self, tmp_path):
        engine = run_short(
            tmp_path, drawer="vqgan", vqgan_model="tiny_test", size=[48, 32]
        )
        # canvas snapped to the decoder's resolution grid (f=2 for 2 levels)
        assert engine.side_x % 2 == 0

    def test_vdiff_tiny(self, tmp_path):
        engine = run_short(
            tmp_path, drawer="vdiff", vdiff_model="tiny_test", size=[48, 32],
            init_noise=None, iterations=4,
        )
        # post_step re-noise happened at it=1 → fresh optimizer with schedule LR
        assert 0 < engine.drawer.learning_rate <= 0.01

    def test_vdiff_upstream_tiny(self, tmp_path):
        # tiny upstream-architecture spec (models/vdiff_upstream.py): the same
        # executor+layer-map a real .pth converts onto, engine end-to-end
        engine = run_short(
            tmp_path, drawer="vdiff", vdiff_model="tiny_up", size=[48, 32],
            init_noise=None, iterations=4,
        )
        assert 0 < engine.drawer.learning_rate <= 0.01

    def test_super_resolution_engine(self, tmp_path, monkeypatch):
        import jax
        import jax.numpy as jnp

        import pixray_tpu.drawers.super_resolution as sr
        from pixray_tpu.models.esrgan import RRDBNet

        # patch the cache with a tiny net before init
        tiny = RRDBNet(num_feat=16, num_block=1, num_grow_ch=8, scale=4)
        variables = tiny.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        sr._global_model_cache["models/super_resolution_RealESRGAN_x4plus.ckpt"] = {
            "model": tiny, "variables": variables,
        }
        run_short(tmp_path, drawer="super_resolution", size=[32, 32])


class TestOptimizerVariants:
    @pytest.mark.parametrize("opt", ["AdamW", "Adagrad", "Adamax", "DiffGrad", "AdamP"])
    def test_optimizers_step(self, tmp_path, opt):
        engine = run_short(tmp_path, optimiser=opt, iterations=2)
        assert np.isfinite(np.asarray(engine.z)).all()


class TestCustomLossRegistration:
    def test_add_custom_loss(self, tmp_path):
        import jax.numpy as jnp

        from pixray_tpu.losses.base import LossInterface

        class BrightLoss(LossInterface):
            def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None):
                return -jnp.mean(out)

        pixray.add_custom_loss("bright", BrightLoss)
        engine = run_short(tmp_path, custom_loss="bright:0.5")
        assert any("BrightLoss" in n for n in engine.loss_names)

    def test_loss_via_settings(self, tmp_path):
        engine = run_short(tmp_path, custom_loss="smoothness:0.25,saturation")
        names = engine.loss_names
        assert any("SmoothnessLoss" in n for n in names)
        assert any("SaturationLoss" in n for n in names)

    def test_filters_via_settings(self, tmp_path):
        engine = run_short(tmp_path, filters="tiler")
        assert any("TilerFilter" in n for n in engine.loss_names)


class TestPerceptorEnsemble:
    def test_two_perceptors_different_resolutions(self, tmp_path):
        """Multi-perceptor ensembles: per-resolution cutout banks, summed losses
        (reference quality presets select up to 5 perceptors, pixray.py:1824-46)."""
        engine = run_short(tmp_path, clip_models="TinyTest,TinyTest48", prompts="x|y")
        names = engine.loss_names
        # each perceptor scores each prompt
        assert sum("TinyTest:" in n for n in names) == 2
        assert sum("TinyTest48:" in n for n in names) == 2
        sizes = {s.cut_size for s in engine.step_cfg.perceptors}
        assert sizes == {32, 48}


class TestHeavyLossesInEngine:
    def test_style_loss_engine(self, tmp_path):
        from PIL import Image
        import numpy as np

        rng = np.random.default_rng(0)
        style_file = tmp_path / "style.png"
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype("uint8")).save(style_file)
        engine = run_short(
            tmp_path, size=[72, 48], custom_loss="style:0.5",
            style_file=str(style_file), styleloss_skip=0,
        )
        assert any("StyleLoss" in n for n in engine.loss_names)

    def test_resmem_loss_engine(self, tmp_path):
        engine = run_short(tmp_path, custom_loss="resmem")
        assert any("ResmemLoss" in n for n in engine.loss_names)

    def test_aesthetic_loss_engine(self, tmp_path):
        engine = run_short(tmp_path, custom_loss="aesthetic")
        assert any("AestheticLoss" in n for n in engine.loss_names)

    def test_instance_settings_arrow_args(self, tmp_path):
        # 'loss->arg' instance-argument splitting (reference pixray.py:966-981)
        engine = run_short(tmp_path, custom_loss="saturation->extra:0.5")
        assert any("SaturationLoss" in n for n in engine.loss_names)


class TestAspectRetain:
    def test_retain_uses_init_image_aspect(self, tmp_path):
        from PIL import Image

        src = tmp_path / "wide.png"
        Image.new("RGB", (200, 100), (10, 10, 10)).save(src)
        import pixray_tpu as pixray

        pixray.reset_settings()
        pixray.add_settings(
            drawer="fast_pixel", clip_models="TinyTest", prompts="x",
            aspect="retain", scale=1, init_image=str(src), iterations=2,
            save_every=1, vector_prompts="none", num_cuts=4, seed=1,
            outdir=str(tmp_path / "out"), save_intermediates=False,
            learning_rate_drops=[],
        )
        settings = pixray.apply_settings()
        assert settings.size == [144, 72]  # 144*scale x 144*aspect*scale
