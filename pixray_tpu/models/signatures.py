"""Synthetic checkpoint signatures: the torch key/shape layout of every
upstream checkpoint family, reconstructed from the published architectures.

These builders are the *spec* side of the converter audit
(tools/validate_weights.py --audit, tests/test_clip.py): each returns a state
dict with exactly the keys and shapes the real upstream checkpoint carries —
OpenAI CLIP (ViT and ModifiedResNet), SLIP's timm trunk, taming-transformers
VQModel/GumbelVQ, basicsr RRDBNet, torchvision VGG16 — so converter
mis-mappings (wrong key, wrong nesting, transposed shape) are caught without
any real asset on disk.  The vdiff family has its own spec-derived signatures
in models/vdiff_upstream.py (expected_state_shapes).

Reference checkpoint layouts: /root/reference/slip.py:173-186 (CLIP/SLIP),
vqgan.py:96-158 (taming), real_esrganer.py + basicsr RRDBNet (ESRGAN),
Losses/StyleLoss.py:121-166 (torchvision VGG16 features).
"""

from __future__ import annotations

import numpy as np


class RecordingDict(dict):
    """dict that records which keys a converter actually read."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read_keys: set = set()

    def __getitem__(self, k):
        self.read_keys.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.read_keys.add(k)
        return super().get(k, default)

    def unread(self):
        return sorted(set(self.keys()) - self.read_keys)


def _adder(sd, rng):
    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    return add


def _clip_text_tower(sd, rng, cfg):
    add = _adder(sd, rng)
    tw = cfg.text_width
    add("token_embedding.weight", cfg.vocab_size, tw)
    add("positional_embedding", cfg.context_length, tw)
    add("ln_final.weight", tw)
    add("ln_final.bias", tw)
    add("text_projection", tw, cfg.embed_dim)
    for i in range(cfg.text_layers):
        _mha_block(sd, rng, f"transformer.resblocks.{i}", tw)


def _mha_block(sd, rng, prefix, d):
    add = _adder(sd, rng)
    add(f"{prefix}.ln_1.weight", d)
    add(f"{prefix}.ln_1.bias", d)
    add(f"{prefix}.ln_2.weight", d)
    add(f"{prefix}.ln_2.bias", d)
    add(f"{prefix}.attn.in_proj_weight", 3 * d, d)
    add(f"{prefix}.attn.in_proj_bias", 3 * d)
    add(f"{prefix}.attn.out_proj.weight", d, d)
    add(f"{prefix}.attn.out_proj.bias", d)
    add(f"{prefix}.mlp.c_fc.weight", 4 * d, d)
    add(f"{prefix}.mlp.c_fc.bias", 4 * d)
    add(f"{prefix}.mlp.c_proj.weight", d, 4 * d)
    add(f"{prefix}.mlp.c_proj.bias", d)


def openai_clip_signature(cfg, rng=None):
    """OpenAI CLIP state-dict layout (ViT or ModifiedResNet visual tower)."""
    rng = rng or np.random.default_rng(0)
    sd = RecordingDict()
    add = _adder(sd, rng)

    if cfg.vision_kind == "vit":
        p, w = cfg.vision_patch_size, cfg.vision_width
        n = (cfg.image_resolution // p) ** 2 + 1
        add("visual.conv1.weight", w, 3, p, p)
        add("visual.class_embedding", w)
        add("visual.positional_embedding", n, w)
        add("visual.ln_pre.weight", w)
        add("visual.ln_pre.bias", w)
        add("visual.ln_post.weight", w)
        add("visual.ln_post.bias", w)
        add("visual.proj", w, cfg.embed_dim)
        for i in range(cfg.vision_layers):
            _mha_block(sd, rng, f"visual.transformer.resblocks.{i}", w)
    else:
        w = cfg.vision_width

        def add_bn(prefix, c):
            add(f"{prefix}.weight", c)
            add(f"{prefix}.bias", c)
            sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

        add("visual.conv1.weight", w // 2, 3, 3, 3)
        add_bn("visual.bn1", w // 2)
        add("visual.conv2.weight", w // 2, w // 2, 3, 3)
        add_bn("visual.bn2", w // 2)
        add("visual.conv3.weight", w, w // 2, 3, 3)
        add_bn("visual.bn3", w)
        inplanes = w
        for stage, blocks in enumerate(cfg.vision_layers):
            planes = w * (2**stage)
            for blk in range(blocks):
                pre = f"visual.layer{stage + 1}.{blk}"
                add(f"{pre}.conv1.weight", planes, inplanes, 1, 1)
                add_bn(f"{pre}.bn1", planes)
                add(f"{pre}.conv2.weight", planes, planes, 3, 3)
                add_bn(f"{pre}.bn2", planes)
                add(f"{pre}.conv3.weight", planes * 4, planes, 1, 1)
                add_bn(f"{pre}.bn3", planes * 4)
                if blk == 0 and (stage > 0 or inplanes != planes * 4):
                    add(f"{pre}.downsample.0.weight", planes * 4, inplanes, 1, 1)
                    add_bn(f"{pre}.downsample.1", planes * 4)
                inplanes = planes * 4
        feat = w * 32
        spatial = cfg.image_resolution // 32
        add("visual.attnpool.positional_embedding", spatial * spatial + 1, feat)
        for proj in ("q_proj", "k_proj", "v_proj"):
            add(f"visual.attnpool.{proj}.weight", feat, feat)
            add(f"visual.attnpool.{proj}.bias", feat)
        add("visual.attnpool.c_proj.weight", cfg.embed_dim, feat)
        add("visual.attnpool.c_proj.bias", cfg.embed_dim)

    _clip_text_tower(sd, rng, cfg)
    return sd


def slip_clip_signature(cfg, rng=None):
    """SLIP checkpoint layout: timm ViT trunk + CLIP-style text tower."""
    rng = rng or np.random.default_rng(0)
    sd = RecordingDict()
    add = _adder(sd, rng)

    p, w = cfg.vision_patch_size, cfg.vision_width
    n = (cfg.image_resolution // p) ** 2 + 1
    add("visual.patch_embed.proj.weight", w, 3, p, p)
    add("visual.patch_embed.proj.bias", w)
    add("visual.cls_token", 1, 1, w)
    add("visual.pos_embed", 1, n, w)
    add("visual.norm.weight", w)
    add("visual.norm.bias", w)
    add("image_projection", w, cfg.embed_dim)
    for i in range(cfg.vision_layers):
        pre = f"visual.blocks.{i}"
        add(f"{pre}.norm1.weight", w)
        add(f"{pre}.norm1.bias", w)
        add(f"{pre}.norm2.weight", w)
        add(f"{pre}.norm2.bias", w)
        add(f"{pre}.attn.qkv.weight", 3 * w, w)
        add(f"{pre}.attn.qkv.bias", 3 * w)
        add(f"{pre}.attn.proj.weight", w, w)
        add(f"{pre}.attn.proj.bias", w)
        add(f"{pre}.mlp.fc1.weight", 4 * w, w)
        add(f"{pre}.mlp.fc1.bias", 4 * w)
        add(f"{pre}.mlp.fc2.weight", w, 4 * w)
        add(f"{pre}.mlp.fc2.bias", w)

    _clip_text_tower(sd, rng, cfg)
    return sd


def taming_vqgan_signature(cfg, rng=None):
    """taming-transformers VQModel/GumbelVQ state-dict layout for a config."""
    rng = rng or np.random.default_rng(0)
    sd = RecordingDict()
    add = _adder(sd, rng)

    def conv(prefix, cin, cout, k):
        add(f"{prefix}.weight", cout, cin, k, k)
        add(f"{prefix}.bias", cout)

    def gn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)

    def resblock(prefix, cin, cout):
        gn(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout, 3)
        gn(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.nin_shortcut", cin, cout, 1)

    def attn(prefix, c):
        gn(f"{prefix}.norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            conv(f"{prefix}.{nm}", c, c, 1)

    # encoder (mirrors models/vqgan.py Encoder / taming encoder layout)
    conv("encoder.conv_in", 3, cfg.ch, 3)
    cur_res, c = cfg.resolution, cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        for j in range(cfg.num_res_blocks):
            resblock(f"encoder.down.{i}.block.{j}", c, cfg.ch * mult)
            c = cfg.ch * mult
            if cur_res in cfg.attn_resolutions:
                attn(f"encoder.down.{i}.attn.{j}", c)
        if i != cfg.num_resolutions - 1:
            conv(f"encoder.down.{i}.downsample.conv", c, c, 3)
            cur_res //= 2
    resblock("encoder.mid.block_1", c, c)
    attn("encoder.mid.attn_1", c)
    resblock("encoder.mid.block_2", c, c)
    gn("encoder.norm_out", c)
    conv("encoder.conv_out", c, cfg.z_channels, 3)

    # decoder
    c = cfg.ch * cfg.ch_mult[-1]
    cur_res = cfg.resolution // (2 ** (cfg.num_resolutions - 1))
    conv("decoder.conv_in", cfg.z_channels, c, 3)
    resblock("decoder.mid.block_1", c, c)
    attn("decoder.mid.attn_1", c)
    resblock("decoder.mid.block_2", c, c)
    for i in reversed(range(cfg.num_resolutions)):
        out_ch = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            resblock(f"decoder.up.{i}.block.{j}", c, out_ch)
            c = out_ch
            if cur_res in cfg.attn_resolutions:
                attn(f"decoder.up.{i}.attn.{j}", c)
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", c, c, 3)
            cur_res *= 2
    gn("decoder.norm_out", c)
    conv("decoder.conv_out", c, 3, 3)

    conv("quant_conv", cfg.z_channels, cfg.embed_dim, 1)
    conv("post_quant_conv", cfg.embed_dim, cfg.z_channels, 1)
    if cfg.gumbel:
        add("quantize.embed.weight", cfg.n_embed, cfg.embed_dim)
    else:
        add("quantize.embedding.weight", cfg.n_embed, cfg.embed_dim)
    return sd


def rrdbnet_signature(num_feat=64, num_block=23, num_grow_ch=32, rng=None):
    """basicsr RRDBNet (RealESRGAN x4) state-dict layout."""
    rng = rng or np.random.default_rng(0)
    sd = RecordingDict()
    add = _adder(sd, rng)

    def conv(prefix, cin, cout):
        add(f"{prefix}.weight", cout, cin, 3, 3)
        add(f"{prefix}.bias", cout)

    conv("conv_first", 3, num_feat)
    for i in range(num_block):
        for r in (1, 2, 3):
            cin = num_feat
            for c in range(1, 6):
                cout = num_grow_ch if c < 5 else num_feat
                conv(f"body.{i}.rdb{r}.conv{c}", cin, cout)
                cin += num_grow_ch
    conv("conv_body", num_feat, num_feat)
    conv("conv_up1", num_feat, num_feat)
    conv("conv_up2", num_feat, num_feat)
    conv("conv_hr", num_feat, num_feat)
    conv("conv_last", num_feat, 3)
    return sd


def vgg16_signature(rng=None):
    """torchvision vgg16 ``features.N.{weight,bias}`` layout (conv layers)."""
    rng = rng or np.random.default_rng(0)
    sd = RecordingDict()
    add = _adder(sd, rng)
    channels = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    feature_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    cin = 3
    for fi, cout in zip(feature_indices, channels):
        add(f"features.{fi}.weight", cout, cin, 3, 3)
        add(f"features.{fi}.bias", cout)
        cin = cout
    return sd
