"""Tiler filter: random toroidal x/y roll with zero loss, so CLIP scores every
seam phase and the result tiles (reference /root/reference/filters/tiler.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixray_tpu.filters.base import FilterInterface


class TilerFilter(FilterInterface):
    def __call__(self, img, key, params=None):
        h, w = img.shape[0], img.shape[1]
        kh, kw = jax.random.split(key)
        rand_h = jax.random.randint(kh, (), 0, h)
        rand_w = jax.random.randint(kw, (), 0, w)
        img = jnp.roll(img, shift=(rand_h, rand_w), axis=(0, 1))
        return img, jnp.zeros(())
