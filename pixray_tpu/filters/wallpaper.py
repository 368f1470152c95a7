"""Wallpaper filter: random rolls (plus optional half-shift row doubling and
edge-match losses) for tileable/wallpaper-group outputs.

Reference: /root/reference/filters/wallpaper.py (modes: shift / horizontal /
vertical / default-both, each with optional seam-matching MSE loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixray_tpu.filters.base import FilterInterface


class WallpaperFilter(FilterInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--wallpaper_type", type=str, help="none, shift, horizontal, vertical", default=None, dest="wallpaper_type")
        parser.add_argument("--wallpaper_edge_match", type=int, help="force repeating match in pixels", default=0, dest="wallpaper_edge_match")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        self.wallpaper_type = settings.wallpaper_type
        self.edge_match = settings.wallpaper_edge_match

    def __call__(self, img, key, params=None):
        h, w = img.shape[0], img.shape[1]
        kh, kw = jax.random.split(key)
        rand_h = jax.random.randint(kh, (), 0, h)
        rand_w = jax.random.randint(kw, (), 0, w)
        loss = jnp.zeros(())
        em = self.edge_match
        em2 = em // 2

        if self.wallpaper_type == "shift":
            half_w = w // 2
            row2 = jnp.roll(img, shift=half_w, axis=1)
            two_rows = jnp.concatenate([img, row2], axis=0)
            img = jnp.roll(two_rows, shift=(rand_h, rand_w), axis=(0, 1))
        elif self.wallpaper_type == "horizontal":
            if em:
                loss = jnp.mean((img[:, :em] - img[:, -em:]) ** 2) / em
                img = img[:, em2 : w - em2]
            img = jnp.roll(img, shift=rand_w, axis=1)
        elif self.wallpaper_type == "vertical":
            if em:
                loss = jnp.mean((img[:em] - img[-em:]) ** 2) / em
                img = img[em2 : h - em2]
            img = jnp.roll(img, shift=rand_h, axis=0)
        else:
            if em:
                loss1 = jnp.mean((img[:, :em] - img[:, -em:]) ** 2) / em
                img = img[:, em2 : w - em2]
                loss2 = jnp.mean((img[:em] - img[-em:]) ** 2) / em
                img = img[em2 : h - em2]
                loss = loss1 + loss2
            img = jnp.roll(img, shift=(rand_h, rand_w), axis=(0, 1))
        return img, loss
