"""Filter plug-in contract (reference /root/reference/filters/FilterInterface.py).

Filters transform the synthesized canvas inside the jitted step and may emit a
loss: ``filter(img, key) -> (img, loss)``.  Implementations must be pure; image is
(H, W, C) channels-last.
"""

from __future__ import annotations


class FilterInterface:
    @staticmethod
    def add_settings(parser):
        return parser

    def __init__(self, settings=None):
        self.settings = settings

    def __call__(self, img, key, params=None):
        import jax.numpy as jnp

        return img, jnp.zeros(())
