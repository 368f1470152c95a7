"""Front-end tests: CLI argv path (pixray.py) and the YAML runner (run.py)."""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_proc(args, cwd):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PIXRAY_TPU_NO_DOWNLOAD="1",
               PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""))
    return subprocess.run(args, cwd=cwd, env=env, capture_output=True, text=True, timeout=600)


def test_cli_run(tmp_path):
    out = run_proc(
        [sys.executable, os.path.join(REPO, "pixray.py"),
         "--drawer=fast_pixel", "--prompts=a test", "--clip_models=TinyTest",
         "--size", "48", "32", "--iterations=2", "--save_every=1", "--seed=5",
         "--init_noise=none", "--vector_prompts=none", "--num_cuts=4",
         "--outdir", str(tmp_path / "cli_out"), "--save_intermediates=false",
         ],
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(tmp_path / "cli_out" / "output.png")
    # settings.yaml provenance dump written (non-default settings)
    dumped = yaml.safe_load(open(tmp_path / "cli_out" / "settings.yaml"))
    assert dumped["drawer"] == "fast_pixel"
    assert os.path.exists(tmp_path / "cli_out" / "output.log")


def test_yaml_runner(tmp_path):
    cfg = {
        "drawer": "fast_pixel",
        "prompts": "yaml test",
        "clip_models": "TinyTest",
        "size": [48, 32],
        "iterations": 2,
        "save_every": 1,
        "seed": 3,
        "init_noise": None,
        "vector_prompts": "none",
        "num_cuts": 4,
        "outdir": str(tmp_path / "yaml_out"),
        "save_intermediates": False,
    }
    cfg_file = tmp_path / "run.yaml"
    cfg_file.write_text(yaml.dump(cfg))
    out = run_proc([sys.executable, os.path.join(REPO, "run.py"), str(cfg_file)], cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(tmp_path / "yaml_out" / "output.png")


def test_cli_config_file(tmp_path):
    cfg_file = tmp_path / "conf.yaml"
    cfg_file.write_text(yaml.dump({"prompts": "from config yaml", "iterations": 2}))
    out = run_proc(
        [sys.executable, os.path.join(REPO, "pixray.py"),
         "--drawer=fast_pixel", "--clip_models=TinyTest",
         "--size", "48", "32", "--save_every=1", "--seed=5",
         "--init_noise=none", "--vector_prompts=none", "--num_cuts=4",
         "--outdir", str(tmp_path / "cfg_out"), "--save_intermediates=false",
         "--config_file", str(cfg_file),
         ],
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from PIL import Image

    img = Image.open(tmp_path / "cfg_out" / "output.png")
    assert img.info.get("pixray_prompts") == "from config yaml"  # raw pre-split value, reference semantics


def test_validate_weights_harness_skips_cleanly(tmp_path):
    """The real-checkpoint validation harness runs end-to-end with no assets:
    every check skips, the report is written, exit code 0."""
    import json

    report = tmp_path / "parity.json"
    out = run_proc(
        [sys.executable, os.path.join(REPO, "tools", "validate_weights.py"),
         "--report", str(report)],
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(report.read_text())
    assert data["ok"] is True
    assert set(data["skipped"]) == {
        "clip_parity:ViT-B/32", "vqgan_decode:imagenet_f16_16384", "convergence"
    }
