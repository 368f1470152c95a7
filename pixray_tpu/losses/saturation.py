"""Saturation loss: negative Hasler–Süsstrunk colorfulness of the cutouts.

Reference: /root/reference/Losses/SaturationLoss.py:14-29.
"""

from __future__ import annotations

import jax.numpy as jnp

from pixray_tpu.losses.base import LossInterface


class SaturationLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--saturation_weight", type=float, help="strength of saturation loss effect", default=1, dest="saturation_weight")
        return parser

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        losses = []
        for _, cutouts in cur_cutouts.items():
            pixels = cutouts.reshape(-1, 3)
            rg = pixels[:, 0] - pixels[:, 1]
            yb = 0.5 * (pixels[:, 0] + pixels[:, 1]) - pixels[:, 2]
            std_rggb = jnp.sqrt(jnp.var(rg, ddof=1) + jnp.var(yb, ddof=1))
            mean_rggb = jnp.sqrt(jnp.mean(rg) ** 2 + jnp.mean(yb) ** 2)
            colorfulness = std_rggb + 0.3 * mean_rggb
            losses.append(-colorfulness * args.saturation_weight / 10.0)
        return losses
