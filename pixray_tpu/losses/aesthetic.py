"""Aesthetic loss: linear rating head on the engine-computed CLIP embeds.

Reference: /root/reference/Losses/AestheticLoss.py (512→1 linear head trained on
AVA ratings of ViT-B/16 embeds; reuses ``globals['embeds']`` rather than
re-encoding, pixray.py:1377-1381).  Head weights are loaded from
models/ava_vit_b_16_linear.pth when present; otherwise a zero-initialized head is
used with a warning (the loss is then inert but the pipeline stays runnable).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from pixray_tpu.losses.base import LossInterface
from pixray_tpu.ops.grad import l2_normalize


class AestheticLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--aesthetic_target", type=float, help="0-10", default=10, dest="aesthetic_target")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        path = os.path.join(os.environ.get("PIXRAY_TPU_MODELS", "models"), "ava_vit_b_16_linear.pth")
        if os.path.exists(path):
            import torch

            layer_weights = torch.load(path, map_location="cpu")
            self.weight = jnp.asarray(layer_weights["weight"].float().numpy())  # (1, 512)
            self.bias = jnp.asarray(layer_weights["bias"].float().numpy())  # (1,)
        else:
            print("WARNING: aesthetic head weights not found (models/ava_vit_b_16_linear.pth); using zeros")
            self.weight = jnp.zeros((1, 512), jnp.float32)
            self.bias = jnp.zeros((1,), jnp.float32)
        self.params = {"weight": self.weight, "bias": self.bias}

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        p = params or self.params
        weight, bias = p["weight"], p["bias"]
        embeds = globals["embeds"]  # (N, D) from the engine's last perceptor
        d = weight.shape[1]
        if embeds.shape[-1] != d:
            # head is dimension-specific (ViT-B/16); skip silently on mismatch
            return jnp.zeros(())
        rating = l2_normalize(embeds, axis=-1) @ weight.T + bias  # (N, 1)
        target = jnp.full_like(rating, args.aesthetic_target)
        return jnp.mean(jnp.square(rating - target)) * 0.02
