"""Color-lookup filter: VQ-style nearest-palette snap with straight-through
gradients and a commitment loss.

Reference: /root/reference/filters/colorlookup.py (beta-weighted codebook loss,
alpha channel passthrough, built-in 16-color default palette).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixray_tpu.filters.base import FilterInterface

DEFAULT_COLOR_TABLE = [
    [0, 0, 0], [255, 255, 255], [63, 40, 50], [38, 43, 68],
    [90, 105, 136], [139, 155, 180], [25, 60, 62], [38, 92, 66],
    [62, 137, 72], [99, 199, 77], [254, 231, 97], [254, 174, 52],
    [254, 174, 52], [247, 118, 34], [184, 111, 80], [116, 63, 57],
]


class ColorLookup(FilterInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--lookup_beta", type=float, help="loss scaling", default=10.0, dest="lookup_beta")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        self.beta = settings.lookup_beta
        table = settings.palette
        if table is None:
            print("WARNING: using built in palette")
            table = [[c / 255.0 for c in rgb] for rgb in DEFAULT_COLOR_TABLE]
        print(f"color table has {len(table)} entries like {table[0:5]}")
        self.color_table = jnp.asarray(table, jnp.float32)  # (K, 3)

    def __call__(self, img, key, params=None):
        has_alpha = img.shape[-1] == 4
        alpha = img[..., 3:] if has_alpha else None
        z3 = img[..., :3]

        flat = z3.reshape(-1, 3)
        d2 = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ self.color_table.T
            + jnp.sum(self.color_table**2, axis=1)[None, :]
        )
        ind = jnp.argmin(d2, axis=-1)
        z_q = self.color_table[ind].reshape(z3.shape)

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z3) ** 2) + jnp.mean(
            (z_q - jax.lax.stop_gradient(z3)) ** 2
        )
        # straight-through estimator
        z_q = z3 + jax.lax.stop_gradient(z_q - z3)
        out = jnp.concatenate([z_q, alpha], axis=-1) if has_alpha else z_q
        return out, loss
