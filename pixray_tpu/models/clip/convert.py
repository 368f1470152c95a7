"""Checkpoint conversion: OpenAI CLIP / HF CLIPModel state dicts → Flax variables.

The reference obtains weights via ``clip.load`` (TorchScript archives); we accept
the same ``.pt`` files, plain torch state dicts, or HuggingFace CLIPModel state
dicts, and map them onto the parameter tree of
:mod:`pixray_tpu.models.clip.model`.  Conversion is pure renaming + transposes —
layouts were chosen so no numerics change.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _dense(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd, key):
    # torch (out, in, kh, kw) → flax (kh, kw, in, out)
    return {"kernel": _t(sd[key]).transpose(2, 3, 1, 0)}


def _bn(sd, prefix):
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def _resblock(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "in_proj": {
                "kernel": _t(sd[f"{prefix}.attn.in_proj_weight"]).T,
                "bias": _t(sd[f"{prefix}.attn.in_proj_bias"]),
            },
            "out_proj": _dense(sd, f"{prefix}.attn.out_proj"),
        },
        "mlp_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "mlp_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def _transformer(sd, prefix, layers):
    return {f"resblock_{i}": _resblock(sd, f"{prefix}.resblocks.{i}") for i in range(layers)}


def convert_openai_clip(state_dict, config):
    """OpenAI CLIP state dict → {'params': ..., 'batch_stats': ...} Flax variables."""
    sd = state_dict  # read-only; kept as-is so audit RecordingDicts see key reads
    params: dict = {}
    batch_stats: dict = {}

    # ---- vision tower
    if config.vision_kind == "vit":
        p = config.vision_patch_size
        width = config.vision_width
        conv1 = _t(sd["visual.conv1.weight"])  # (width, 3, p, p)
        visual = {
            "patch_embedding": conv1.transpose(2, 3, 1, 0).reshape(p * p * 3, width),
            "class_embedding": _t(sd["visual.class_embedding"]),
            "positional_embedding": _t(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": _t(sd["visual.proj"]),
            "transformer": _transformer(sd, "visual.transformer", config.vision_layers),
        }
        params["visual"] = visual
    else:
        visual: dict = {}
        visual_stats: dict = {}
        for i in (1, 2, 3):
            visual[f"conv{i}"] = _conv(sd, f"visual.conv{i}.weight")
            bnp, bns = _bn(sd, f"visual.bn{i}")
            visual[f"bn{i}"] = bnp
            visual_stats[f"bn{i}"] = bns
        for stage, blocks in enumerate(config.vision_layers):
            for blk in range(blocks):
                t_prefix = f"visual.layer{stage + 1}.{blk}"
                name = f"layer{stage + 1}_{blk}"
                block: dict = {}
                block_stats: dict = {}
                for i in (1, 2, 3):
                    block[f"conv{i}"] = _conv(sd, f"{t_prefix}.conv{i}.weight")
                    bnp, bns = _bn(sd, f"{t_prefix}.bn{i}")
                    block[f"bn{i}"] = bnp
                    block_stats[f"bn{i}"] = bns
                if f"{t_prefix}.downsample.0.weight" in sd:
                    block["downsample_conv"] = _conv(sd, f"{t_prefix}.downsample.0.weight")
                    bnp, bns = _bn(sd, f"{t_prefix}.downsample.1")
                    block["downsample_bn"] = bnp
                    block_stats["downsample_bn"] = bns
                visual[name] = block
                visual_stats[name] = block_stats
        visual["attnpool"] = {
            "positional_embedding": _t(sd["visual.attnpool.positional_embedding"]),
            "q_proj": _dense(sd, "visual.attnpool.q_proj"),
            "k_proj": _dense(sd, "visual.attnpool.k_proj"),
            "v_proj": _dense(sd, "visual.attnpool.v_proj"),
            "c_proj": _dense(sd, "visual.attnpool.c_proj"),
        }
        params["visual"] = visual
        batch_stats["visual"] = visual_stats

    # ---- text tower
    params["text"] = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
        "transformer": _transformer(sd, "transformer", config.text_layers),
    }

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_hf_clip(state_dict, config):
    """HuggingFace CLIPModel state dict → Flax variables (ViT variants)."""
    sd = {k: _t(v) for k, v in state_dict.items()}

    def hf_block(prefix):
        q = sd[f"{prefix}.self_attn.q_proj.weight"]
        k = sd[f"{prefix}.self_attn.k_proj.weight"]
        v = sd[f"{prefix}.self_attn.v_proj.weight"]
        qb = sd[f"{prefix}.self_attn.q_proj.bias"]
        kb = sd[f"{prefix}.self_attn.k_proj.bias"]
        vb = sd[f"{prefix}.self_attn.v_proj.bias"]
        return {
            "ln_1": {"scale": sd[f"{prefix}.layer_norm1.weight"], "bias": sd[f"{prefix}.layer_norm1.bias"]},
            "ln_2": {"scale": sd[f"{prefix}.layer_norm2.weight"], "bias": sd[f"{prefix}.layer_norm2.bias"]},
            "attn": {
                "in_proj": {
                    "kernel": np.concatenate([q, k, v], axis=0).T,
                    "bias": np.concatenate([qb, kb, vb], axis=0),
                },
                "out_proj": {
                    "kernel": sd[f"{prefix}.self_attn.out_proj.weight"].T,
                    "bias": sd[f"{prefix}.self_attn.out_proj.bias"],
                },
            },
            "mlp_fc": {"kernel": sd[f"{prefix}.mlp.fc1.weight"].T, "bias": sd[f"{prefix}.mlp.fc1.bias"]},
            "mlp_proj": {"kernel": sd[f"{prefix}.mlp.fc2.weight"].T, "bias": sd[f"{prefix}.mlp.fc2.bias"]},
        }

    p = config.vision_patch_size
    width = config.vision_width
    conv1 = sd["vision_model.embeddings.patch_embedding.weight"]
    visual = {
        "patch_embedding": conv1.transpose(2, 3, 1, 0).reshape(p * p * 3, width),
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre": {"scale": sd["vision_model.pre_layrnorm.weight"], "bias": sd["vision_model.pre_layrnorm.bias"]},
        "ln_post": {"scale": sd["vision_model.post_layernorm.weight"], "bias": sd["vision_model.post_layernorm.bias"]},
        "proj": sd["visual_projection.weight"].T,
        "transformer": {
            f"resblock_{i}": hf_block(f"vision_model.encoder.layers.{i}")
            for i in range(config.vision_layers)
        },
    }
    text = {
        "token_embedding": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final": {"scale": sd["text_model.final_layer_norm.weight"], "bias": sd["text_model.final_layer_norm.bias"]},
        "text_projection": sd["text_projection.weight"].T,
        "transformer": {
            f"resblock_{i}": hf_block(f"text_model.encoder.layers.{i}")
            for i in range(config.text_layers)
        },
    }
    return {"params": {"visual": visual, "text": text}}


def convert_slip_clip(state_dict, config):
    """SLIP checkpoint (timm ViT trunk + CLIP text tower) → Flax variables.

    SLIP state dicts (facebookresearch/SLIP; reference slip.py:125-145) use a
    timm VisionTransformer: visual.patch_embed.proj (biased conv), cls_token,
    pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    visual.norm, and separate image_projection/text_projection parameters.
    """
    sd = state_dict  # read-only; kept as-is so audit RecordingDicts see key reads
    p = config.vision_patch_size
    width = config.vision_width

    def timm_block(prefix):
        return {
            "ln_1": {"scale": _t(sd[f"{prefix}.norm1.weight"]), "bias": _t(sd[f"{prefix}.norm1.bias"])},
            "ln_2": {"scale": _t(sd[f"{prefix}.norm2.weight"]), "bias": _t(sd[f"{prefix}.norm2.bias"])},
            "attn": {
                "in_proj": {
                    "kernel": _t(sd[f"{prefix}.attn.qkv.weight"]).T,
                    "bias": _t(sd[f"{prefix}.attn.qkv.bias"]),
                },
                "out_proj": _dense(sd, f"{prefix}.attn.proj"),
            },
            "mlp_fc": _dense(sd, f"{prefix}.mlp.fc1"),
            "mlp_proj": _dense(sd, f"{prefix}.mlp.fc2"),
        }

    conv1 = _t(sd["visual.patch_embed.proj.weight"])  # (width, 3, p, p)
    visual = {
        "patch_embedding": conv1.transpose(2, 3, 1, 0).reshape(p * p * 3, width),
        "patch_bias": _t(sd["visual.patch_embed.proj.bias"]),
        "class_embedding": _t(sd["visual.cls_token"]).reshape(width),
        "positional_embedding": _t(sd["visual.pos_embed"]).reshape(-1, width),
        "ln_post": {"scale": _t(sd["visual.norm.weight"]), "bias": _t(sd["visual.norm.bias"])},
        "proj": _t(sd["image_projection"]),
        "transformer": {
            f"resblock_{i}": timm_block(f"visual.blocks.{i}")
            for i in range(config.vision_layers)
        },
    }
    text = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
        "transformer": _transformer(sd, "transformer", config.text_layers),
    }
    return {"params": {"visual": visual, "text": text}}


def load_torch_state_dict(path: str):
    """Load a torch checkpoint (TorchScript archive or plain state dict) as numpy."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
