"""pixray_tpu — TPU-native CLIP-guided image optimization framework.

Public API mirrors the reference's module surface (/root/reference/pixray.py:
2005-2124) so existing recipes port directly:

    import pixray_tpu as pixray
    pixray.reset_settings()
    pixray.add_settings(prompts="a sunrise", drawer="pixel")
    settings = pixray.apply_settings()
    pixray.do_init(settings)
    pixray.do_run(settings)

or the one-liner ``pixray_tpu.run(prompts=..., drawer=...)``.
"""

from __future__ import annotations

import os as _os

# Honor an explicit $JAX_PLATFORMS even when a site hook has overridden the
# jax_platforms config after jax read the env (some managed images force an
# accelerator plugin in sitecustomize).  Only effective before backends
# initialize; a no-op otherwise.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        from jax._src import xla_bridge as _xb

        if not _xb.backends_are_initialized():
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from pixray_tpu.registry import add_custom_loss  # noqa: F401

_global_settings: dict = {}
_engine = None


def reset_settings():
    global _global_settings
    _global_settings = {}


def add_settings(**kwargs):
    for k, v in kwargs.items():
        _global_settings[k] = v


def get_settings() -> dict:
    return _global_settings.copy()


def apply_settings():
    from pixray_tpu.config import apply_settings as _apply

    return _apply(_global_settings)


def do_init(settings):
    global _engine
    from pixray_tpu.engine.core import Engine

    _engine = Engine(settings)
    return _engine


def do_run(settings, return_display: bool = False) -> bool:
    assert _engine is not None, "call do_init first"
    return _engine.run(return_display=return_display)


def get_engine():
    return _engine


def run(prompts=None, drawer="vqgan", **kwargs):
    """One-stop API (reference pixray.py:2119-2124)."""
    reset_settings()
    add_settings(prompts=prompts, drawer=drawer, **kwargs)
    settings = apply_settings()
    do_init(settings)
    do_run(settings)


def command_line_override():
    """Parse settings purely from argv (reference pixray.py:2111-2116)."""
    reset_settings()
    return apply_settings()


def main():
    """CLI entry point: settings come from argv (+ optional --config_file YAML)."""
    reset_settings()
    settings = apply_settings()
    print(
        f"Running with {settings.num_cuts}x{settings.batches} = "
        f"{settings.num_cuts * settings.batches} cuts"
    )
    do_init(settings)
    do_run(settings)


__version__ = "0.1.0"
