"""Flax VQGAN (taming-transformers VQModel / GumbelVQ equivalents).

The reference drives taming's torch VQGAN (/root/reference/vqgan.py:15,
123-136): encoder → quant_conv → vector-quantize → post_quant_conv → decoder.
This is a from-scratch NHWC Flax implementation with a taming-checkpoint
converter; configs cover the reference's model zoo families (f16 VQModels and
the f8 Gumbel variant; vqgan.py:19-46).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VQGANConfig:
    ch: int = 128
    ch_mult: tuple = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    resolution: int = 256
    z_channels: int = 256
    embed_dim: int = 256
    n_embed: int = 16384
    gumbel: bool = False

    @property
    def num_resolutions(self):
        return len(self.ch_mult)


VQGAN_CONFIGS = {
    # tiny model for CI/e2e tests (random weights; CPU-fast; f4)
    "tiny_test": VQGANConfig(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        resolution=32, z_channels=32, embed_dim=32, n_embed=64,
    ),
    "imagenet_f16_1024": VQGANConfig(n_embed=1024),
    "imagenet_f16_16384": VQGANConfig(n_embed=16384),
    "imagenet_f16_16384m": VQGANConfig(n_embed=16384),
    "coco": VQGANConfig(n_embed=8192),
    "faceshq": VQGANConfig(n_embed=1024),
    "wikiart_1024": VQGANConfig(n_embed=1024),
    "wikiart_1024m": VQGANConfig(n_embed=1024),
    "wikiart_16384": VQGANConfig(n_embed=16384),
    "wikiart_16384m": VQGANConfig(n_embed=16384),
    "wikiart_16384m2": VQGANConfig(n_embed=16384),
    "sflckr": VQGANConfig(n_embed=1024),
    "openimages_f16_8192": VQGANConfig(
        ch_mult=(1, 1, 2, 2, 4), n_embed=8192, gumbel=True
    ),
}


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-6)(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VQGANConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        cur_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
                if cur_res in cfg.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != cfg.num_resolutions - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i}_downsample")(h)
                cur_res //= 2
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(cfg.z_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VQGANConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        block_in = cfg.ch * cfg.ch_mult[-1]
        cur_res = cfg.resolution // (2 ** (cfg.num_resolutions - 1))
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(cfg.num_resolutions)):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
                if cur_res in cfg.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)
                cur_res *= 2
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class VQGAN(nn.Module):
    """encode: image [-1,1] → quantized latent; decode: latent → image [-1,1]."""

    config: VQGANConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype)
        self.decoder = Decoder(cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), dtype=self.dtype)
        self.codebook = self.param(
            "codebook", nn.initializers.uniform(scale=2.0 / cfg.n_embed),
            (cfg.n_embed, cfg.embed_dim),
        )

    def quantize(self, z):
        """Nearest-codebook quantization with straight-through gradient
        (reference vqgan.py:60-64 vector_quantize semantics)."""
        flat = z.reshape(-1, z.shape[-1])
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ self.codebook.T
            + jnp.sum(self.codebook**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        z_q = self.codebook[idx].reshape(z.shape)
        return z + jax.lax.stop_gradient(z_q - z)

    def encode(self, x):
        h = self.encoder(x)
        h = self.quant_conv(h)
        return self.quantize(h)

    def decode(self, z_q):
        return self.decoder(self.post_quant_conv(z_q))

    def decode_from_continuous(self, z):
        return self.decode(self.quantize(z))

    def __call__(self, x):
        return self.decode(self.encode(x))

    def codebook_bounds(self):
        return jnp.min(self.codebook, axis=0), jnp.max(self.codebook, axis=0)


# ---------------------------------------------------------------------------
# taming-transformers checkpoint conversion
# ---------------------------------------------------------------------------

def _c(sd, key):
    # torch conv (out, in, kh, kw) → flax (kh, kw, in, out)
    return jnp.asarray(np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0))


def _cb(sd, prefix):
    return {"kernel": _c(sd, f"{prefix}.weight"), "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}


def _gn(sd, prefix):
    return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}


def _resblock(sd, prefix, has_shortcut):
    out = {
        "norm1": _gn(sd, f"{prefix}.norm1"),
        "conv1": _cb(sd, f"{prefix}.conv1"),
        "norm2": _gn(sd, f"{prefix}.norm2"),
        "conv2": _cb(sd, f"{prefix}.conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _cb(sd, f"{prefix}.nin_shortcut")
    return out


def _attnblock(sd, prefix):
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "q": _cb(sd, f"{prefix}.q"),
        "k": _cb(sd, f"{prefix}.k"),
        "v": _cb(sd, f"{prefix}.v"),
        "proj_out": _cb(sd, f"{prefix}.proj_out"),
    }


def convert_taming_vqgan(state_dict, config: VQGANConfig):
    """taming VQModel/GumbelVQ state dict → Flax variables for VQGAN."""
    sd = state_dict
    cfg = config
    params: dict = {}

    # encoder
    enc: dict = {"conv_in": _cb(sd, "encoder.conv_in")}
    cur_res = cfg.resolution
    for i in range(cfg.num_resolutions):
        for j in range(cfg.num_res_blocks):
            pre = f"encoder.down.{i}.block.{j}"
            enc[f"down_{i}_block_{j}"] = _resblock(sd, pre, f"{pre}.nin_shortcut.weight" in sd)
            if cur_res in cfg.attn_resolutions:
                enc[f"down_{i}_attn_{j}"] = _attnblock(sd, f"encoder.down.{i}.attn.{j}")
        if i != cfg.num_resolutions - 1:
            enc[f"down_{i}_downsample"] = {"conv": _cb(sd, f"encoder.down.{i}.downsample.conv")}
            cur_res //= 2
    enc["mid_block_1"] = _resblock(sd, "encoder.mid.block_1", "encoder.mid.block_1.nin_shortcut.weight" in sd)
    enc["mid_attn_1"] = _attnblock(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _resblock(sd, "encoder.mid.block_2", "encoder.mid.block_2.nin_shortcut.weight" in sd)
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _cb(sd, "encoder.conv_out")
    params["encoder"] = enc

    # decoder
    dec: dict = {"conv_in": _cb(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _resblock(sd, "decoder.mid.block_1", "decoder.mid.block_1.nin_shortcut.weight" in sd)
    dec["mid_attn_1"] = _attnblock(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _resblock(sd, "decoder.mid.block_2", "decoder.mid.block_2.nin_shortcut.weight" in sd)
    cur_res = cfg.resolution // (2 ** (cfg.num_resolutions - 1))
    for i in reversed(range(cfg.num_resolutions)):
        for j in range(cfg.num_res_blocks + 1):
            pre = f"decoder.up.{i}.block.{j}"
            dec[f"up_{i}_block_{j}"] = _resblock(sd, pre, f"{pre}.nin_shortcut.weight" in sd)
            if cur_res in cfg.attn_resolutions:
                dec[f"up_{i}_attn_{j}"] = _attnblock(sd, f"decoder.up.{i}.attn.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = {"conv": _cb(sd, f"decoder.up.{i}.upsample.conv")}
            cur_res *= 2
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _cb(sd, "decoder.conv_out")
    params["decoder"] = dec

    params["quant_conv"] = _cb(sd, "quant_conv")
    params["post_quant_conv"] = _cb(sd, "post_quant_conv")
    if cfg.gumbel:
        params["codebook"] = jnp.asarray(np.asarray(sd["quantize.embed.weight"], np.float32))
    else:
        params["codebook"] = jnp.asarray(np.asarray(sd["quantize.embedding.weight"], np.float32))
    return {"params": params}
