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
