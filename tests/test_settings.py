"""Settings-system tests: presets, unit conversion, LR-drop scheduling, overlay
scheduling (reference spec: /root/reference/tests/test_pixray.py)."""

import sys

import pytest

from pixray_tpu.config import apply_settings, get_learning_rate_drops
from pixray_tpu.prompt import parse_prompt


def settings(**kw):
    kw.setdefault("drawer", "fast_pixel")
    return apply_settings(kw, apply_side_effects=False)


class TestLearningRateDrops:
    def test_empty(self):
        assert get_learning_rate_drops(None, 300) == []

    def test_single(self):
        assert get_learning_rate_drops([75], 300) == [224]

    def test_multi(self):
        assert get_learning_rate_drops([50, 22.5], 300) == [149, 67]


class TestApplyOverlay:
    def make(self, overlay_image, every, offset, until):
        from pixray_tpu.engine.schedule import apply_overlay

        args = settings(
            overlay_image=overlay_image,
            overlay_every=every,
            overlay_offset=offset,
            overlay_until=until,
        )
        return apply_overlay, args

    def test_all_true(self):
        fn, args = self.make("image.png", "1i", "0i", "100i")
        assert fn(args, 10) is True

    def test_no_overlay_image(self):
        fn, args = self.make(None, "1i", "0i", "100i")
        assert fn(args, 10) is False

    def test_not_at_offset(self):
        fn, args = self.make("image.png", "5i", "10i", "100i")
        assert fn(args, 10) is False

    def test_until_none(self):
        fn, args = self.make("image.png", "5i", "10i", None)
        assert fn(args, 10) is False

    def test_less_than_until(self):
        fn, args = self.make("image.png", "1i", "0i", "5i")
        assert fn(args, 10) is False


class TestPresets:
    def test_defaults(self):
        args = settings(prompts="hello")
        assert args.iterations == 250
        assert args.num_cuts == 30
        assert args.batches == 1
        assert args.clip_models == ["ViT-B/32", "ViT-B/16"]
        assert args.size == [384, 216]  # widescreen x scale 2
        assert args.prompts == ["hello"]

    def test_supreme(self):
        args = settings(quality="supreme")
        assert args.iterations == 400
        assert args.num_cuts == 8
        assert args.batches == 4
        assert len(args.clip_models) == 4

    def test_square_aspect(self):
        args = settings(aspect="square", scale=1)
        assert args.size == [144, 144]
        assert args.aspect_width == 1.0

    def test_explicit_size(self):
        args = settings(size=[100, 200])
        assert args.size == [100, 200]
        assert args.aspect_width == 0.5

    def test_pipes_split(self):
        args = settings(prompts="a|b", labels="x|y")
        assert args.prompts == ["a", "b"]
        assert args.labels == ["x", "y"]

    def test_save_every_percent(self):
        args = settings(save_every="10%", iterations=200)
        assert args.save_every == 20

    def test_lr_drops_resolved(self):
        args = settings(iterations=300)
        assert args.learning_rate_drops == [224]
        assert args.max_loss_drops == 1

    def test_bogus_key_rejected(self):
        with pytest.raises(ValueError):
            settings(not_a_real_setting=1)

    def test_unknown_drawer_rejected(self):
        with pytest.raises(ValueError):
            apply_settings({"drawer": "nope"}, apply_side_effects=False)

    def test_palette_parsed(self):
        args = settings(palette="mat:black->mat:white\\4")
        assert len(args.palette) == 4

    def test_vector_prompt_default(self):
        args = settings()
        assert args.vector_prompts == ["textoff"]

    def test_vector_prompt_none(self):
        args = settings(vector_prompts="none")
        assert args.vector_prompts == []

    def test_yaml_config_file(self, tmp_path):
        cfg = tmp_path / "conf.yaml"
        cfg.write_text("prompts: from_yaml\nquality: draft\n")
        args = settings(config_file=str(cfg))
        assert args.prompts == ["from_yaml"]
        assert args.iterations == 200

    def test_given_args_tracks_non_defaults(self):
        args = settings(quality="draft")
        assert args.given_args.get("quality") == "draft"
        assert "learning_rate" not in args.given_args


class TestParsePrompt:
    def test_plain(self):
        assert parse_prompt("a cat") == ("a cat", 1.0, float("-inf"))

    def test_weight(self):
        assert parse_prompt("a cat:2") == ("a cat", 2.0, float("-inf"))

    def test_weight_and_stop(self):
        assert parse_prompt("a cat:2:-0.5") == ("a cat", 2.0, -0.5)

    def test_negative_weight(self):
        assert parse_prompt("blurry:-1") == ("blurry", -1.0, float("-inf"))

    def test_colon_text_preserved(self):
        assert parse_prompt("re:zero")[0] == "re:zero"
