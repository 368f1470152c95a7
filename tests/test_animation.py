"""Animation-mode e2e: frame ring training + inter-round blending + GIF."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import pixray_tpu as pixray
from tests.test_e2e import tiny_settings


def test_animation_ring(tmp_path):
    # two overlay frames drive a 2-frame animation ring
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    Image.new("RGBA", (64, 36), (255, 0, 0, 120)).save(frames_dir / "f0.png")
    Image.new("RGBA", (64, 36), (0, 0, 255, 120)).save(frames_dir / "f1.png")

    anim_dir = str(tmp_path / "anim")
    pixray.reset_settings()
    pixray.add_settings(
        **tiny_settings(
            tmp_path,
            iterations=4,
            save_every=2,
            overlay_image=str(frames_dir / "f*.png"),
            overlay_every="2i",
            animation_dir=anim_dir,
        )
    )
    settings = pixray.apply_settings()
    engine = pixray.do_init(settings)
    assert pixray.do_run(settings) is True

    # per-frame outputs written
    assert os.path.exists(os.path.join(anim_dir, "f0.png"))
    assert os.path.exists(os.path.join(anim_dir, "f1.png"))
    # frames differ (per-frame latents trained separately)
    a = np.asarray(Image.open(os.path.join(anim_dir, "f0.png")))
    b = np.asarray(Image.open(os.path.join(anim_dir, "f1.png")))
    assert not np.array_equal(a, b)
    # gif assembled
    assert os.path.exists(os.path.join(anim_dir, "anim.gif"))


def test_animation_blocked_matches_single_step(tmp_path):
    """Blocked dispatch must not change animation trajectories: the same
    seeded animation run with steps_per_call=0 (blocks) and =1 (singles)
    produces identical frame outputs.  Blocks never cross a frame span's end
    (the ring swaps self.z between frames — engine core._block_size)."""

    def run(sub, steps_per_call):
        frames_dir = tmp_path / f"frames_{sub}"
        frames_dir.mkdir()
        Image.new("RGBA", (64, 36), (255, 0, 0, 120)).save(frames_dir / "f0.png")
        Image.new("RGBA", (64, 36), (0, 0, 255, 120)).save(frames_dir / "f1.png")
        anim_dir = str(tmp_path / f"anim_{sub}")
        pixray.reset_settings()
        pixray.add_settings(
            **tiny_settings(
                tmp_path,
                iterations=20,
                save_every=10,  # span 10 > BLOCK_STEPS 8: interior blocks form
                overlay_image=str(frames_dir / "f*.png"),
                overlay_every="100i",
                animation_dir=anim_dir,
                steps_per_call=steps_per_call,
                outdir=str(tmp_path / f"out_{sub}"),
            )
        )
        settings = pixray.apply_settings()
        pixray.do_init(settings)
        assert pixray.do_run(settings) is True
        return [
            np.asarray(Image.open(os.path.join(anim_dir, f"f{i}.png")))
            for i in range(2)
        ]

    blocked = run("blocked", 0)
    single = run("single", 1)
    for b, s in zip(blocked, single):
        np.testing.assert_array_equal(b, s)


def test_make_video_frames(tmp_path):
    pixray.reset_settings()
    pixray.add_settings(**tiny_settings(tmp_path, make_video=True, iterations=3))
    settings = pixray.apply_settings()
    # make_video with apply_side_effects=False skips dir creation; create it
    os.makedirs(os.path.join(settings.outdir, "video"), exist_ok=True)
    engine = pixray.do_init(settings)
    pixray.do_run(settings)
    frames = os.listdir(os.path.join(settings.outdir, "video"))
    assert any(f.startswith("frame_") for f in frames)
