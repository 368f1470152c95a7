"""Palette loss: mean distance of cutout pixels to their nearest target color.

Reference: /root/reference/Losses/PaletteLoss.py:24-34.
"""

from __future__ import annotations

import jax.numpy as jnp

from pixray_tpu.losses.base import LossInterface


class PaletteLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--palette_weight", type=float, help="strength of palette loss effect", default=1, dest="palette_weight")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        palette = settings.palette if settings is not None and settings.palette else None
        if palette is None:
            raise ValueError("palette loss requires --palette")
        self.palette = jnp.asarray(palette, dtype=jnp.float32)  # (K, 3)

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        losses = []
        for _, cutouts in cur_cutouts.items():
            pixels = cutouts.reshape(-1, 3)  # (M, 3)
            # squared distances to each palette color; nearest by argmin
            d2 = (
                jnp.sum(pixels**2, axis=1, keepdims=True)
                - 2.0 * pixels @ self.palette.T
                + jnp.sum(self.palette**2, axis=1)[None, :]
            )
            best = jnp.argmin(d2, axis=1)
            diffs = pixels - self.palette[best]
            loss = jnp.mean(jnp.linalg.norm(diffs, axis=1)) * cutouts.shape[0]
            losses.append(loss * args.palette_weight / 10.0)
        return losses
