"""Output provenance: every saved PNG embeds version, non-default settings, and seed.

Reference behavior: /root/reference/pixray.py:1112-1156 (git version lookup with a
baked release fallback, PNG tEXt chunks with ``pixray_*`` keys and the seed used).
"""

from __future__ import annotations

import os
import subprocess

from PIL import PngImagePlugin

OFFICIAL_RELEASE_VERSION = None
FALLBACK_VERSION = "v0.1.0+tpu"

_cached_version = None


def framework_version() -> str:
    """git describe of this repo, with a baked fallback for release builds."""
    global _cached_version
    if OFFICIAL_RELEASE_VERSION is not None:
        return OFFICIAL_RELEASE_VERSION
    if _cached_version is not None:
        return _cached_version

    try:
        env = {k: v for k in ("SYSTEMROOT", "PATH") if (v := os.environ.get(k))}
        env.update({"LANGUAGE": "C", "LANG": "C", "LC_ALL": "C"})
        out = subprocess.Popen(
            ["git", "describe", "--always"],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ).communicate()[0]
        version = out.strip().decode("ascii")
        _cached_version = version if version else FALLBACK_VERSION
    except OSError:
        _cached_version = FALLBACK_VERSION
    return _cached_version


def build_png_info(given_args: dict, seed_used) -> PngImagePlugin.PngInfo:
    """PNG tEXt metadata carrying full reproduction info."""
    info = PngImagePlugin.PngInfo()
    info.add_text("Software", f"pixray_tpu ({framework_version()})")
    for k, v in given_args.items():
        info.add_text(f"pixray_{k}", str(v))
    info.add_text("pixray_seed_used", str(seed_used))
    return info
