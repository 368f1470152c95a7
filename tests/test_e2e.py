"""End-to-end engine tests: a full init→run session on CPU with a tiny perceptor.

This is the parity harness for the reference's minimum slice (fast_pixel drawer +
text prompt + Adam + checkin/PNG/provenance; SURVEY.md §7 stage 4).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import pixray_tpu as pixray


def tiny_settings(tmp_path, **overrides):
    kw = dict(
        drawer="fast_pixel",
        prompts="a test prompt",
        clip_models="TinyTest",
        size=[64, 36],
        iterations=4,
        save_every=2,
        display_every=2,
        init_noise="pixels",
        vector_prompts="none",
        num_cuts=4,
        batches=1,
        seed=42,
        outdir=str(tmp_path / "out"),
        save_intermediates=False,
        learning_rate_drops=[],
    )
    kw.update(overrides)
    return kw


@pytest.fixture
def session(tmp_path):
    pixray.reset_settings()
    pixray.add_settings(**tiny_settings(tmp_path))
    settings = pixray.apply_settings()
    engine = pixray.do_init(settings)
    return settings, engine


class TestEndToEnd:
    def test_full_run_produces_output(self, session):
        settings, engine = session
        assert pixray.do_run(settings) is True
        outfile = os.path.join(settings.outdir, "output.png")
        assert os.path.exists(outfile)
        img = Image.open(outfile)
        assert img.size == (64, 36)
        # provenance metadata baked into the PNG
        assert "pixray_seed_used" in img.info
        assert img.info["pixray_prompts"] == "a test prompt"

    def test_loss_decreases_loggable(self, session):
        settings, engine = session
        z0 = np.asarray(engine.z).copy()
        engine.train(0)
        z1 = np.asarray(engine.z)
        assert not np.allclose(z0, z1), "latent must move after a step"
        assert np.isfinite(np.asarray(engine.last_loss_values)).all()

    def test_deterministic_given_seed(self, tmp_path):
        losses = []
        for _ in range(2):
            pixray.reset_settings()
            pixray.add_settings(**tiny_settings(tmp_path))
            settings = pixray.apply_settings()
            engine = pixray.do_init(settings)
            engine.train(0)
            losses.append(np.asarray(engine.last_loss_values).sum())
        assert losses[0] == losses[1]

    def test_return_display_streaming(self, session):
        settings, engine = session
        assert pixray.do_run(settings, return_display=True) is False  # paused at display_every
        assert engine.cur_iteration == 2
        assert pixray.do_run(settings, return_display=True) is False  # pauses again at 4
        assert pixray.do_run(settings, return_display=True) is True  # final call completes


class TestEngineFeatures:
    def test_init_image(self, tmp_path):
        src = tmp_path / "init.png"
        Image.new("RGB", (64, 36), (255, 0, 0)).save(src)
        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, init_image=str(src), iterations=2))
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        # latent should start red-ish
        img = np.asarray(engine.synth_image())
        assert img[..., 0].mean() > img[..., 1].mean() + 50

    def test_init_weight_loss_present(self, tmp_path):
        src = tmp_path / "init.png"
        Image.new("RGB", (64, 36), (0, 255, 0)).save(src)
        pixray.reset_settings()
        pixray.add_settings(
            **tiny_settings(tmp_path, init_image=str(src), init_weight=1.0, iterations=2)
        )
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        engine.train(0)
        assert "init_weight" in engine.loss_names

    def test_negative_prompt_weight(self, tmp_path):
        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, prompts="ugly:-1|nice:2"))
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        engine.train(0)
        vals = np.asarray(engine.last_loss_values)
        assert len(vals) == 2
        assert vals[0] < 0  # negative-weight prompt contributes negative loss

    def test_spot_prompts(self, tmp_path):
        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, spot_prompts="thing", spot_prompts_off="ground"))
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        engine.train(0)
        names = engine.loss_names
        assert any("spot0" in n for n in names)
        assert any("spot_off0" in n for n in names)

    def test_image_prompts(self, tmp_path):
        src = tmp_path / "prompt_img.png"
        Image.new("RGB", (64, 64), (0, 0, 255)).save(src)
        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, image_prompts=str(src)))
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        engine.train(0)
        assert any("image_prompt" in n for n in engine.loss_names)

    def test_overlay_reaverage(self, tmp_path):
        ov = tmp_path / "overlay.png"
        Image.new("RGBA", (64, 36), (255, 255, 0, 200)).save(ov)
        pixray.reset_settings()
        pixray.add_settings(
            **tiny_settings(tmp_path, overlay_image=str(ov), overlay_every="1i", iterations=2)
        )
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        engine.train(0)  # overlay applies at it 0
        img = np.asarray(engine.synth_image())
        # yellow overlay should dominate: R,G high; B low
        assert img[..., 2].mean() < img[..., 0].mean()


def test_save_svg(tmp_path):
    pixray.reset_settings()
    pixray.add_settings(**tiny_settings(tmp_path, drawer="pixel", pixel_size=[8, 6],
                                        save_svg=True, iterations=2, save_every=1))
    settings = pixray.apply_settings()
    pixray.do_init(settings)
    pixray.do_run(settings)
    svg_path = os.path.join(settings.outdir, "output.svg")
    assert os.path.exists(svg_path)
    assert "<svg" in open(svg_path).read()
