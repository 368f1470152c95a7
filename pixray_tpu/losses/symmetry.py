"""Symmetry loss: MSE between the canvas and its horizontal flip.

Reference: /root/reference/Losses/SymmetryLoss.py:14-17.
"""

from __future__ import annotations

import jax.numpy as jnp

from pixray_tpu.losses.base import LossInterface


class SymmetryLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--symmetry_weight", type=float, help="how much symmetry is weighted in loss", default=1, dest="symmetry_weight")
        return parser

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        flipped = jnp.flip(out, axis=1)  # flip width (out is HWC)
        return jnp.mean((out - flipped) ** 2) * args.symmetry_weight
