"""Seed-sweep / frame-ring launcher contracts (pixray_tpu/parallel/sweep.py).

The launcher is the cross-host parallelism pattern the reference runs by hand
(one session per GPU over seeds or animation frames); these tests pin the
deterministic scheduling contract without touching a device.
"""

import os
import subprocess
import sys

import pytest

from pixray_tpu.parallel.sweep import parse_seeds, shard, stage_anim_shard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPartition:
    def test_parse_seeds_ranges(self):
        assert parse_seeds("1,5,8-11") == [1, 5, 8, 9, 10, 11]
        assert parse_seeds("0-3") == [0, 1, 2, 3]
        assert parse_seeds("-2") == [-2]

    def test_parse_seeds_rejects_empty_range(self):
        with pytest.raises(ValueError):
            parse_seeds("9-3")

    def test_shard_contiguous_cover_disjoint(self):
        units = list(range(10))
        shards = [shard(units, 4, i) for i in range(4)]
        # contiguous, ordered, disjoint, covering
        assert shards == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]
        flat = [u for s in shards for u in s]
        assert flat == units

    def test_shard_more_hosts_than_units(self):
        units = [0, 1]
        shards = [shard(units, 4, i) for i in range(4)]
        assert [len(s) for s in shards] == [1, 1, 0, 0]

    def test_shard_bad_index(self):
        with pytest.raises(ValueError):
            shard([1], 2, 2)

    def test_stage_anim_shard_symlinks_span(self, tmp_path):
        frames = []
        for i in range(3):
            f = tmp_path / f"frame_{i:03d}.png"
            f.write_bytes(b"x")
            frames.append(str(f))
        glob_pat = stage_anim_shard(frames, 1, str(tmp_path / "stage"))
        d = os.path.dirname(glob_pat)
        assert sorted(os.listdir(d)) == [f"frame_{i:03d}.png" for i in range(3)]
        assert all(os.path.islink(os.path.join(d, n)) for n in os.listdir(d))
        # idempotent re-stage (resume after a crash)
        stage_anim_shard(frames, 1, str(tmp_path / "stage"))


class TestRunPaths:
    """The code a multi-host user actually executes: run_seed_shard /
    run_anim_shard drive real engine sessions over this host's shard."""

    @pytest.mark.slow
    def test_run_seed_shard_e2e(self, tmp_path):
        import numpy as np
        from PIL import Image

        from pixray_tpu.parallel.sweep import run_seed_shard
        from tests.test_e2e import tiny_settings

        base = tiny_settings(tmp_path, iterations=2, save_every=1,
                             display_every=1)
        base.pop("seed")
        base.pop("outdir")
        run_seed_shard(base, [3, 4], str(tmp_path / "sweep" / "%SEED%"))

        images = {}
        for seed in (3, 4):
            outdir = tmp_path / "sweep" / str(seed)
            pngs = sorted(outdir.glob("*.png"))
            assert pngs, f"no output written for seed {seed}"
            img = Image.open(pngs[0])
            # PNG provenance records the per-session seed
            assert img.text["pixray_seed_used"] == str(seed)
            images[seed] = np.asarray(img)
        assert not np.array_equal(images[3], images[4])

    @pytest.mark.slow
    def test_run_anim_shard_e2e(self, tmp_path):
        import os as _os

        from PIL import Image

        from pixray_tpu.parallel.sweep import run_anim_shard
        from tests.test_e2e import tiny_settings

        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        colors = [(255, 0, 0, 120), (0, 255, 0, 120),
                  (0, 0, 255, 120), (255, 255, 0, 120)]
        for i, c in enumerate(colors):
            Image.new("RGBA", (64, 36), c).save(frames_dir / f"f{i}.png")

        base = tiny_settings(tmp_path, iterations=4, save_every=2,
                             overlay_every="2i")
        base.pop("outdir")
        # host 1 of 2 stages + trains the span [f2, f3]
        mine = run_anim_shard(base, str(frames_dir / "f*.png"), 2, 1,
                              "overlay_image", str(tmp_path / "stage"),
                              dry_run=False)
        assert [_os.path.basename(f) for f in mine] == ["f2.png", "f3.png"]
        anim_out = tmp_path / "stage" / "anim_out_1"
        for name in ("f2.png", "f3.png"):
            assert (anim_out / name).exists(), f"frame output {name} missing"
        # the staged shard contains exactly this host's span
        staged = sorted(_os.listdir(tmp_path / "stage" / "anim_shard_1"))
        assert staged == ["f2.png", "f3.png"]


class TestCLIPlan:
    def test_dry_run_plan_no_jax(self, tmp_path):
        """--dry_run prints the plan without importing jax (cheap on any host)."""
        y = tmp_path / "s.yaml"
        y.write_text("prompts: hi\n")
        out = subprocess.run(
            [sys.executable, "-m", "pixray_tpu.parallel.sweep", str(y),
             "--seeds", "0-6", "--num_hosts", "3", "--host_index", "1",
             "--outdir", "out/%SEED%", "--dry_run"],
            capture_output=True, text=True, cwd=REPO, timeout=120,
            env={**os.environ, "PIXRAY_TPU_NO_DOWNLOAD": "1"},
        )
        assert out.returncode == 0, out.stderr
        lines = out.stdout.strip().splitlines()
        assert lines[-1] == "total 3 seeds on this host"
        assert "seed=3 -> out/3" in lines[0]
