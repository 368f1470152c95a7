"""Extension-point registries: drawers, losses, filters, perceptors.

Mirrors the reference's registry tables (/root/reference/pixray.py:55-140) including
its soft-degradation property: optional drawers that fail to import are skipped with
a console note rather than breaking the package (pixray.py:79-113), which keeps the
package importable on CPU-only CI.
"""

from __future__ import annotations

import importlib

DRAWER_CLASSES: dict[str, type] = {}
LOSS_CLASSES: dict[str, type] = {}
FILTER_CLASSES: dict[str, type] = {}

_DRAWER_MODULES = {
    # always-on drawers
    "fast_pixel": ("pixray_tpu.drawers.fast_pixel", "FastPixelDrawer"),
    "pixel": ("pixray_tpu.drawers.pixel", "PixelDrawer"),
    "fft": ("pixray_tpu.drawers.fft", "FftDrawer"),
    "vqgan": ("pixray_tpu.drawers.vqgan", "VqganDrawer"),
    # optional drawers (native/heavyweight); soft-fail like the reference
    "clipdraw": ("pixray_tpu.drawers.clipdraw", "ClipDrawer"),
    "line_sketch": ("pixray_tpu.drawers.line_sketch", "LineDrawer"),
    "vdiff": ("pixray_tpu.drawers.vdiff", "VdiffDrawer"),
    "super_resolution": ("pixray_tpu.drawers.super_resolution", "SuperResolutionDrawer"),
}

_LOSS_MODULES = {
    "palette": ("pixray_tpu.losses.palette", "PaletteLoss"),
    "saturation": ("pixray_tpu.losses.saturation", "SaturationLoss"),
    "symmetry": ("pixray_tpu.losses.symmetry", "SymmetryLoss"),
    "smoothness": ("pixray_tpu.losses.smoothness", "SmoothnessLoss"),
    "edge": ("pixray_tpu.losses.edge", "EdgeLoss"),
    "style": ("pixray_tpu.losses.style", "StyleLoss"),
    "resmem": ("pixray_tpu.losses.resmem", "ResmemLoss"),
    "aesthetic": ("pixray_tpu.losses.aesthetic", "AestheticLoss"),
    # present-but-unregistered in the reference (pixray.py:131-140); we register it
    "gaussian": ("pixray_tpu.losses.gaussian", "GaussianLoss"),
}

_FILTER_MODULES = {
    "lookup": ("pixray_tpu.filters.lookup", "ColorLookup"),
    "tiler": ("pixray_tpu.filters.tiler", "TilerFilter"),
    "wallpaper": ("pixray_tpu.filters.wallpaper", "WallpaperFilter"),
}


def _populate(table: dict, modules: dict, kind: str) -> None:
    for name, (module_name, class_name) in modules.items():
        if name in table:
            continue
        try:
            module = importlib.import_module(module_name)
            table[name] = getattr(module, class_name)
        except ImportError as e:  # soft degradation, reference pixray.py:79-113
            print(f"--> {kind} '{name}' not supported: {e}")


def load_registries() -> None:
    """Populate all registries (idempotent)."""
    _populate(DRAWER_CLASSES, _DRAWER_MODULES, "drawer")
    _populate(LOSS_CLASSES, _LOSS_MODULES, "loss")
    _populate(FILTER_CLASSES, _FILTER_MODULES, "filter")


def add_custom_loss(name: str, loss_class: type) -> None:
    """Runtime loss registration (reference pixray.py:2104-2109)."""
    from pixray_tpu.losses.base import LossInterface

    assert issubclass(loss_class, LossInterface)
    LOSS_CLASSES[name] = loss_class
