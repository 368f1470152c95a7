"""Smoothness loss: gradient-magnitude penalty on the cutouts, with optional
gaussian pre-blur and default/clipped/log shaping.

Reference: /root/reference/Losses/SmoothnessLoss.py:90-108 (torch.gradient-based
central differences; we reproduce torch.gradient's edge_order=1 semantics:
one-sided differences at the edges, central differences inside).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixray_tpu.losses.base import LossInterface


def _gradient_1d(x, axis, spacing=1.0):
    """torch.gradient(edge_order=1) along ``axis``."""
    x = jnp.moveaxis(x, axis, 0)
    inner = (x[2:] - x[:-2]) / (2.0 * spacing)
    first = (x[1:2] - x[0:1]) / spacing
    last = (x[-1:] - x[-2:-1]) / spacing
    g = jnp.concatenate([first, inner, last], axis=0)
    return jnp.moveaxis(g, 0, axis)


def gaussian_kernel_1d(size: int, sigma: float):
    n = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    w = jnp.exp(-(n**2) / (2.0 * sigma**2))
    return w / jnp.sum(w)


def gaussian_blur(images, kernel_size: int, sigma: float):
    """Separable depthwise gaussian blur; images (..., H, W, C)."""
    k = gaussian_kernel_1d(kernel_size, sigma)

    def blur_axis(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        pad = kernel_size // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
        out = jnp.zeros_like(x)
        for i in range(kernel_size):
            out = out + k[i] * jax.lax.dynamic_slice_in_dim(xp, i, x.shape[-1], axis=-1)
        return jnp.moveaxis(out, -1, axis)

    images = blur_axis(images, -3)
    images = blur_axis(images, -2)
    return images


class SmoothnessLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--smoothness_weight", type=float, help="strength of smoothness loss effect", default=1, dest="smoothness_weight")
        parser.add_argument("--smoothness_type", type=str, help="default/clipped/log", default="default", dest="smoothness_type")
        parser.add_argument("--smoothness_gaussian_kernel", type=int, help="gaussian blur kernel size (0=off)", default=0, dest="smoothness_gaussian_kernel")
        parser.add_argument("--smoothness_gaussian_std", type=float, help="gaussian blur std", default=1, dest="smoothness_gaussian_std")
        parser.add_argument("--smoothness_spacing", type=int, help="gradient spacing", default=1, dest="smoothness_spacing")
        parser.add_argument("--smoothness_edge_order", type=int, help="(edge_order=1 supported)", default=1, dest="smoothness_edge_order")
        return parser

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        losses = []
        for _, cutouts in cur_cutouts.items():
            x = cutouts
            if args.smoothness_gaussian_kernel:
                x = gaussian_blur(
                    x, int(args.smoothness_gaussian_kernel), args.smoothness_gaussian_std
                )
            # reference stacks all cutouts into one tall (N*H, W, 3) image and
            # differentiates across the stack (SmoothnessLoss.py:96-100)
            x = x.reshape(-1, x.shape[-2], 3)
            gy = _gradient_1d(x, axis=0, spacing=float(args.smoothness_spacing))
            gx = _gradient_1d(x, axis=1, spacing=float(args.smoothness_spacing))
            sharpness = jnp.sqrt(jnp.sum(gy**2, axis=-1) + jnp.sum(gx**2, axis=-1))
            if args.smoothness_type == "clipped":
                sharpness = jnp.minimum(sharpness, 0.5)
            elif args.smoothness_type == "log":
                sharpness = jnp.log1p(sharpness)
            losses.append(jnp.mean(sharpness) * args.smoothness_weight)
        return losses
