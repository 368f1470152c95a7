"""Gaussian loss: pull non-center regions toward a color (inverse gaussian window).

Reference: /root/reference/Losses/GaussianLoss.py (present on disk but unregistered
in the reference's loss table; registered here).
"""

from __future__ import annotations

import jax.numpy as jnp

from pixray_tpu.losses.base import LossInterface


def gaussian_window_2d(h, w, std_y, std_x):
    ny = jnp.arange(h, dtype=jnp.float32) - (h - 1.0) / 2.0
    nx = jnp.arange(w, dtype=jnp.float32) - (w - 1.0) / 2.0
    wy = jnp.exp(-(ny**2) / (2 * std_y * std_y))
    wx = jnp.exp(-(nx**2) / (2 * std_x * std_x))
    return jnp.outer(wy, wx)


class GaussianLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--gaussian_weight", type=float, help="gaussian's weight", default=1, dest="gaussian_weight")
        parser.add_argument("--gaussian_std", nargs=2, type=float, help="std for y and x", default=(40, 40), dest="gaussian_std")
        parser.add_argument("--gaussian_color", nargs=3, type=float, help="target color (0-255)", default=(255, 255, 255), dest="gaussian_color")
        return parser

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        h, w = out.shape[0], out.shape[1]
        gaus = gaussian_window_2d(h, w, *args.gaussian_std)
        color = jnp.asarray(args.gaussian_color, jnp.float32) / 255.0
        loss = jnp.abs(out - color) * jnp.abs(1.0 - gaus)[..., None]
        return jnp.mean(loss) * args.gaussian_weight
