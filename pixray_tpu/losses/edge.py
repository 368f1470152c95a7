"""Edge loss: pull canvas margins (or a masked region) toward a color or image.

Reference: /root/reference/Losses/EdgeLoss.py:60-108 (per-margin percent widths,
optional target image, optional mask image, weak global color pull).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pixray_tpu.losses.base import LossInterface
from pixray_tpu.utils import get_single_rgb, map_number


class EdgeLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--edge_thickness", type=int, help="edge thickness all around (percent)", default=5, dest="edge_thickness")
        parser.add_argument("--edge_margins", nargs=4, type=int, help="per-edge thickness (left, right, up, down)", default=None, dest="edge_margins")
        parser.add_argument("--edge_color", type=str, help="color of the edge region", default="white", dest="edge_color")
        parser.add_argument("--edge_color_weight", type=float, help="edge color enforcement", default=0.1, dest="edge_color_weight")
        parser.add_argument("--global_color_weight", type=float, help="global color pull", default=0.05, dest="global_color_weight")
        parser.add_argument("--edge_input_image", type=str, help="target image for the edge region", default="", dest="edge_input_image")
        parser.add_argument("--edge_mask_image", type=str, help="mask selecting the constrained region", default="", dest="edge_mask_image")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        color = settings.edge_color
        self.edge_color = jnp.asarray(
            get_single_rgb(color) if isinstance(color, str) else color, jnp.float32
        )
        t = settings.edge_thickness
        self.margins = settings.edge_margins if settings.edge_margins is not None else (t, t, t, t)
        self.target_image = None
        self.mask = None
        if settings.edge_input_image:
            from pixray_tpu.io.images import open_images

            img = open_images(settings.edge_input_image)[0].convert("RGB")
            self.target_image_pil = img
        else:
            self.target_image_pil = None
        if settings.edge_mask_image:
            from pixray_tpu.io.images import open_images

            self.mask_pil = open_images(settings.edge_mask_image)[0].convert("L")
        else:
            self.mask_pil = None

    def _targets(self, out):
        h, w = out.shape[0], out.shape[1]
        if self.target_image_pil is not None:
            if self.target_image is None or self.target_image.shape[:2] != (h, w):
                from PIL import Image

                resized = self.target_image_pil.resize((w, h), Image.BICUBIC)
                self.target_image = jnp.asarray(np.asarray(resized, np.float32) / 255.0)
            target = self.target_image
        else:
            target = jnp.broadcast_to(self.edge_color, out.shape)
        mask = None
        if self.mask_pil is not None:
            if self.mask is None or self.mask.shape[:2] != (h, w):
                from PIL import Image

                resized = self.mask_pil.resize((w, h), Image.BICUBIC)
                self.mask = jnp.asarray(np.asarray(resized, np.float32) / 255.0)[..., None]
            mask = self.mask
        return target, mask

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        target, mask = self._targets(out)
        h, w = out.shape[0], out.shape[1]
        loss = jnp.zeros(())
        if mask is None:
            left, right, upper, lower = self.margins
            left = int(map_number(left, 0, 100, 0, w))
            right = int(map_number(right, 0, 100, 0, w))
            upper = int(map_number(upper, 0, 100, 0, h))
            lower = int(map_number(lower, 0, 100, 0, h))
            if left != 0:
                loss += jnp.mean((out[:, :left] - target[:, :left]) ** 2)
            if right != 0:
                loss += jnp.mean((out[:, w - right :] - target[:, w - right :]) ** 2)
            if upper != 0:
                loss += jnp.mean(
                    (out[:upper, left : w - right] - target[:upper, left : w - right]) ** 2
                )
            if lower != 0:
                loss += jnp.mean(
                    (out[h - lower :, left : w - right] - target[h - lower :, left : w - right]) ** 2
                )
        else:
            masked_out = jnp.where(mask > 0, target, out)
            loss += jnp.mean((masked_out - target) ** 2)
        if args.global_color_weight:
            loss += jnp.mean((out - target) ** 2) * args.global_color_weight
        return loss * args.edge_color_weight
