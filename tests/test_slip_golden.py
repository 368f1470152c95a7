"""SLIP-family golden numerics: our Flax timm-style vision trunk and CLIP-style
text tower vs an independent torch execution of the SAME weights.

Closes the round-1 gap "SLIP text towers are assumed CLIP-shaped; nothing
validates the assumption": the torch mirror below implements the published SLIP
architecture semantics (facebookresearch/SLIP models.py — timm ViT trunk with
biased patch conv, no pre-transformer LayerNorm, exact GELU; text tower copied
from CLIP incl. QuickGELU, causal mask, argmax-EOT pooling; reference consumes
it via slip.py:125-145) and both sides run the same converted state dict.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

pytestmark = pytest.mark.slow

from pixray_tpu.models.clip.configs import CLIPConfig
from pixray_tpu.models.clip.convert import convert_slip_clip
from pixray_tpu.models.clip.model import CLIP


def tiny_cfg():
    return CLIPConfig(
        name="tiny-slip", embed_dim=48, image_resolution=32, vision_kind="vit",
        vision_width=64, vision_layers=2, vision_patch_size=8, vision_heads=2,
        context_length=16, vocab_size=64, text_width=32, text_heads=2, text_layers=2,
        vision_style="timm",
    )


def build_state_dict(cfg, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    p, w = cfg.vision_patch_size, cfg.vision_width
    n = (cfg.image_resolution // p) ** 2 + 1
    add("visual.patch_embed.proj.weight", w, 3, p, p)
    add("visual.patch_embed.proj.bias", w)
    add("visual.cls_token", 1, 1, w)
    add("visual.pos_embed", 1, n, w)
    add("visual.norm.weight", w); add("visual.norm.bias", w)
    add("image_projection", w, cfg.embed_dim)
    for i in range(cfg.vision_layers):
        pre = f"visual.blocks.{i}"
        add(f"{pre}.norm1.weight", w); add(f"{pre}.norm1.bias", w)
        add(f"{pre}.norm2.weight", w); add(f"{pre}.norm2.bias", w)
        add(f"{pre}.attn.qkv.weight", 3 * w, w); add(f"{pre}.attn.qkv.bias", 3 * w)
        add(f"{pre}.attn.proj.weight", w, w); add(f"{pre}.attn.proj.bias", w)
        add(f"{pre}.mlp.fc1.weight", 4 * w, w); add(f"{pre}.mlp.fc1.bias", 4 * w)
        add(f"{pre}.mlp.fc2.weight", w, 4 * w); add(f"{pre}.mlp.fc2.bias", w)
    tw = cfg.text_width
    add("token_embedding.weight", cfg.vocab_size, tw)
    add("positional_embedding", cfg.context_length, tw)
    add("ln_final.weight", tw); add("ln_final.bias", tw)
    add("text_projection", tw, cfg.embed_dim)
    for i in range(cfg.text_layers):
        pre = f"transformer.resblocks.{i}"
        add(f"{pre}.ln_1.weight", tw); add(f"{pre}.ln_1.bias", tw)
        add(f"{pre}.ln_2.weight", tw); add(f"{pre}.ln_2.bias", tw)
        add(f"{pre}.attn.in_proj_weight", 3 * tw, tw); add(f"{pre}.attn.in_proj_bias", 3 * tw)
        add(f"{pre}.attn.out_proj.weight", tw, tw); add(f"{pre}.attn.out_proj.bias", tw)
        add(f"{pre}.mlp.c_fc.weight", 4 * tw, tw); add(f"{pre}.mlp.c_fc.bias", 4 * tw)
        add(f"{pre}.mlp.c_proj.weight", tw, 4 * tw); add(f"{pre}.mlp.c_proj.bias", tw)
    return sd


def _t(sd, k):
    return torch.from_numpy(sd[k])


def _mha(x, sd, w_key, b_key, heads, causal=False):
    """torch multi-head attention with packed in_proj (nn.MultiheadAttention
    layout — what both CLIP's and timm's attention reduce to)."""
    b, t, d = x.shape
    qkv = F.linear(x, _t(sd, w_key), _t(sd, b_key))
    q, k, v = qkv.chunk(3, dim=-1)
    hd = d // heads
    q = q.view(b, t, heads, hd).transpose(1, 2)
    k = k.view(b, t, heads, hd).transpose(1, 2)
    v = v.view(b, t, heads, hd).transpose(1, 2)
    attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
    if causal:
        mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
        attn = attn + mask
    out = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, t, d)
    return out


def torch_vision(sd, cfg, images_nchw):
    """timm ViT trunk semantics: biased patch conv, cls token, pos embed,
    pre-norm blocks with EXACT GELU, final norm, cls pooling, projection."""
    p, w, heads = cfg.vision_patch_size, cfg.vision_width, cfg.vision_heads
    x = F.conv2d(images_nchw, _t(sd, "visual.patch_embed.proj.weight"),
                 _t(sd, "visual.patch_embed.proj.bias"), stride=p)
    b, _, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)  # (B, N, W)
    cls = _t(sd, "visual.cls_token").expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1) + _t(sd, "visual.pos_embed")
    for i in range(cfg.vision_layers):
        pre = f"visual.blocks.{i}"
        h = F.layer_norm(x, (w,), _t(sd, f"{pre}.norm1.weight"), _t(sd, f"{pre}.norm1.bias"))
        a = _mha(h, sd, f"{pre}.attn.qkv.weight", f"{pre}.attn.qkv.bias", heads)
        a = F.linear(a, _t(sd, f"{pre}.attn.proj.weight"), _t(sd, f"{pre}.attn.proj.bias"))
        x = x + a
        h = F.layer_norm(x, (w,), _t(sd, f"{pre}.norm2.weight"), _t(sd, f"{pre}.norm2.bias"))
        h = F.linear(h, _t(sd, f"{pre}.mlp.fc1.weight"), _t(sd, f"{pre}.mlp.fc1.bias"))
        h = F.gelu(h)  # timm trunks: exact gelu, not QuickGELU
        h = F.linear(h, _t(sd, f"{pre}.mlp.fc2.weight"), _t(sd, f"{pre}.mlp.fc2.bias"))
        x = x + h
    x = F.layer_norm(x, (w,), _t(sd, "visual.norm.weight"), _t(sd, "visual.norm.bias"))
    return x[:, 0, :] @ _t(sd, "image_projection")


def torch_text(sd, cfg, tokens):
    """CLIP-style text tower as SLIP copies it: QuickGELU, causal mask,
    argmax-EOT pooling, text_projection."""
    tw, heads = cfg.text_width, cfg.text_heads
    x = _t(sd, "token_embedding.weight")[tokens]
    x = x + _t(sd, "positional_embedding")[: x.shape[1]]
    for i in range(cfg.text_layers):
        pre = f"transformer.resblocks.{i}"
        h = F.layer_norm(x, (tw,), _t(sd, f"{pre}.ln_1.weight"), _t(sd, f"{pre}.ln_1.bias"))
        a = _mha(h, sd, f"{pre}.attn.in_proj_weight", f"{pre}.attn.in_proj_bias",
                 heads, causal=True)
        a = F.linear(a, _t(sd, f"{pre}.attn.out_proj.weight"), _t(sd, f"{pre}.attn.out_proj.bias"))
        x = x + a
        h = F.layer_norm(x, (tw,), _t(sd, f"{pre}.ln_2.weight"), _t(sd, f"{pre}.ln_2.bias"))
        h = F.linear(h, _t(sd, f"{pre}.mlp.c_fc.weight"), _t(sd, f"{pre}.mlp.c_fc.bias"))
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        h = F.linear(h, _t(sd, f"{pre}.mlp.c_proj.weight"), _t(sd, f"{pre}.mlp.c_proj.bias"))
        x = x + h
    x = F.layer_norm(x, (tw,), _t(sd, "ln_final.weight"), _t(sd, "ln_final.bias"))
    eot = tokens.argmax(dim=-1)
    x = x[torch.arange(x.shape[0]), eot]
    return x @ _t(sd, "text_projection")


class TestSlipGolden:
    def test_vision_trunk_matches_torch(self):
        cfg = tiny_cfg()
        sd = build_state_dict(cfg)
        variables = convert_slip_clip(sd, cfg)
        model = CLIP(cfg, dtype=jnp.float32)

        rng = np.random.default_rng(1)
        imgs = rng.uniform(-1, 1, size=(3, 32, 32, 3)).astype(np.float32)

        ours = np.asarray(
            model.apply(variables, jnp.asarray(imgs), method=model.encode_image)
        )
        with torch.no_grad():
            ref = torch_vision(sd, cfg, torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_text_tower_matches_torch(self):
        cfg = tiny_cfg()
        sd = build_state_dict(cfg)
        variables = convert_slip_clip(sd, cfg)
        model = CLIP(cfg, dtype=jnp.float32)

        rng = np.random.default_rng(2)
        # tokens with a max somewhere in the middle (EOT pooling position)
        tokens = rng.integers(1, cfg.vocab_size - 1, size=(3, cfg.context_length))
        tokens[:, 5] = cfg.vocab_size - 1  # argmax position
        tokens = tokens.astype(np.int64)

        ours = np.asarray(
            model.apply(variables, jnp.asarray(tokens), method=model.encode_text)
        )
        with torch.no_grad():
            ref = torch_text(sd, cfg, torch.from_numpy(tokens)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
