"""Fast pixel drawer: latent = low-res RGB grid, synth = nearest upsample.

Parity with /root/reference/fast_pixeldrawer.py:24-110 (grid sizing heuristics,
pixel_size/pixel_scale flags, bilinear downsample init, clamp-with-grad output).
The latent lives in [0, 1] directly; ``clip_params`` clamps after each step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixray_tpu.drawers.base import DrawingInterface
from pixray_tpu.ops.grad import clamp_with_grad
from pixray_tpu.ops.pool import nearest_resize


def _grid_for_canvas(settings):
    """Grid sizing heuristic shared with the pixel drawer (fast_pixeldrawer.py:36-61)."""
    w, h = settings.size
    if getattr(settings, "pixel_size", None) is not None:
        num_cols, num_rows = settings.pixel_size
    elif w == h:
        num_cols, num_rows = 40, 40
    elif w < h:
        num_cols, num_rows = 40, 50
    else:
        num_cols, num_rows = 80, 45

    pixel_scale = getattr(settings, "pixel_scale", None)
    if pixel_scale is not None and pixel_scale > 0:
        num_cols = int(num_cols / pixel_scale)
        num_rows = int(num_rows / pixel_scale)

    num_cols = min(num_cols, w)
    num_rows = min(num_rows, h)
    return num_cols, num_rows


class FastPixelDrawer(DrawingInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--pixel_size", nargs=2, type=int, help="Pixel size (width height)", default=None, dest="pixel_size")
        parser.add_argument("--pixel_scale", type=float, help="Pixel scale", default=None, dest="pixel_scale")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.num_cols, self.num_rows = _grid_for_canvas(settings)
        print(f"Running fast pixeldrawer with {self.num_cols}x{self.num_rows} grid")

    def init_params(self, key, init_tensor=None):
        if init_tensor is None:
            return jax.random.uniform(key, (self.num_rows, self.num_cols, 3))
        return self.params_from_image(init_tensor)

    def params_from_image(self, image_tensor):
        img01 = (jnp.asarray(image_tensor) + 1.0) / 2.0
        return jax.image.resize(
            img01, (self.num_rows, self.num_cols, 3), method="bilinear"
        )

    def clip_params(self, z):
        return jnp.clip(z, 0.0, 1.0)

    def synth(self, model_params, z, iteration, key=None):
        out = nearest_resize(z, self.canvas_height, self.canvas_width)
        return clamp_with_grad(out, 0.0, 1.0)
