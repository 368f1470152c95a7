"""v-diffusion: schedules, stepwise v-objective sampler math, and UNet family.

The reference drives a pixray fork of crowsonkb's v-diffusion-pytorch through a
3-call stepwise API (sample_setup / sample_step / sample_noise;
/root/reference/vdiff.py:117-160).  The submodule is not vendored here; the
sampler math below is the published v-objective DDIM formulation the call sites
contract to:

    alpha_t, sigma_t = cos(t·π/2), sin(t·π/2)
    v    = model(x, t)                      (the "v" objective)
    pred = x·alpha_t − v·sigma_t            (denoised estimate, exposed to CLIP)
    eps  = x·sigma_t + v·alpha_t
    re-noise (eta-DDIM):  ddim_sigma = eta·sqrt(sigma²_{t+1}/sigma²_t)·
                                        sqrt(1 − alpha²_t/alpha²_{t+1})
         x_{t+1} = pred·alpha_{t+1} + eps·sqrt(sigma²_{t+1} − ddim_sigma²)
                   + N(0,1)·ddim_sigma

Schedules: spliced-ddpm-cosine (cosine low-t spliced with a DDPM tail) and log.
UNets: a JAX family matching the reference zoo's shapes (yfcc/cc12m/danbooru/
imagenet/wikiart) with Fourier timestep features, ResConv blocks, self-attention
at coarse scales, and cc12m's clip-embed conditioning; trained-weight conversion
is best-effort (weights are external assets).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# schedules (utils.get_spliced_ddpm_cosine_schedule / get_log_schedule)
# ---------------------------------------------------------------------------

def t_to_alpha_sigma(t):
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def get_ddpm_schedule(ddpm_t):
    """Continuous DDPM noise schedule mapped to alpha/sigma t-space."""
    log_snr = -jnp.log(jnp.expm1(1e-4 + 10 * ddpm_t**2))
    alpha_sq = jax.nn.sigmoid(log_snr)
    return jnp.arccos(jnp.sqrt(alpha_sq)) / math.pi * 2


def get_spliced_ddpm_cosine_schedule(t):
    """Cosine schedule near t=0 spliced into a DDPM schedule at larger t."""
    ddpm_crossover = 0.48536712
    cosine_crossover = 0.80074257
    big_t = t * (1 + cosine_crossover - ddpm_crossover)
    ddpm_part = get_ddpm_schedule(big_t + ddpm_crossover - cosine_crossover)
    return jnp.where(big_t < cosine_crossover, big_t, ddpm_part)


def get_log_schedule(t, min_log_snr=-10, max_log_snr=10):
    log_snr = t * (min_log_snr - max_log_snr) + max_log_snr
    alpha_sq = jax.nn.sigmoid(log_snr)
    return jnp.arccos(jnp.sqrt(alpha_sq)) / math.pi * 2


# ---------------------------------------------------------------------------
# stepwise sampler (sampling.sample_setup / sample_step / sample_noise)
# ---------------------------------------------------------------------------

@dataclass
class SampleState:
    """[model, steps, eta, extra_args, ts, alphas, sigmas] per vdiff.py:127."""

    model_fn: object  # (x, t, extra) -> v
    steps: jnp.ndarray
    eta: float
    extra_args: dict
    alphas: jnp.ndarray
    sigmas: jnp.ndarray


def sample_setup(model_fn, steps, eta=1.0, extra_args=None) -> SampleState:
    alphas, sigmas = t_to_alpha_sigma(steps)
    return SampleState(
        model_fn=model_fn, steps=steps, eta=eta,
        extra_args=extra_args or {}, alphas=alphas, sigmas=sigmas,
    )


def sample_step(state: SampleState, x, i, extra_args=None):
    """One exposed-pred sampler step. i may be traced. Returns (pred, v).

    ``extra_args`` overrides ``state.extra_args`` for this call — the vdiff
    drawer threads the (traced) model params through here so the jitted step
    sees them as arguments, never as closure-captured jaxpr constants."""
    t = state.steps[i]
    v = state.model_fn(x, t, state.extra_args if extra_args is None else extra_args)
    alpha, sigma = state.alphas[i], state.sigmas[i]
    pred = x * alpha - v * sigma
    return pred, v


def sample_noise(state: SampleState, x, i, pred, v, key):
    """Eta-DDIM re-noising producing x_{i+1} (reference makenoise)."""
    alpha, sigma = state.alphas[i], state.sigmas[i]
    alpha_next, sigma_next = state.alphas[i + 1], state.sigmas[i + 1]
    eps = x * sigma + v * alpha
    ddim_sigma = (
        state.eta
        * jnp.sqrt(jnp.maximum(sigma_next**2 / jnp.maximum(sigma**2, 1e-12), 0.0))
        * jnp.sqrt(jnp.maximum(1 - alpha**2 / jnp.maximum(alpha_next**2, 1e-12), 0.0))
    )
    adjusted_sigma = jnp.sqrt(jnp.maximum(sigma_next**2 - ddim_sigma**2, 0.0))
    noise = jax.random.normal(key, x.shape, x.dtype)
    return pred * alpha_next + eps * adjusted_sigma + noise * ddim_sigma


# ---------------------------------------------------------------------------
# UNet family
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VDiffConfig:
    name: str
    resolution: int
    base_ch: int
    ch_mults: tuple
    attn_depths: tuple  # depth indices with self-attention
    clip_model: str | None = None  # conditioning perceptor (cc12m family)
    clip_embed_dim: int = 512


# reference model URL table (vdiff.py:24-33)
VDIFF_CHECKPOINT_URLS = {
    "yfcc_2": "https://the-eye.eu/public/AI/models/v-diffusion/yfcc_2.pth",
    "yfcc_1": "https://the-eye.eu/public/AI/models/v-diffusion/yfcc_1.pth",
    "cc12m_1": "https://the-eye.eu/public/AI/models/v-diffusion/cc12m_1.pth",
    "cc12m_1_cfg": "https://the-eye.eu/public/AI/models/v-diffusion/cc12m_1_cfg.pth",
    "danbooru_128": "https://the-eye.eu/public/AI/models/v-diffusion/danbooru_128.pth",
    "imagenet_128": "https://the-eye.eu/public/AI/models/v-diffusion/imagenet_128.pth",
    "wikiart_128": "https://the-eye.eu/public/AI/models/v-diffusion/wikiart_128.pth",
    "wikiart_256": "https://the-eye.eu/public/AI/models/v-diffusion/wikiart_256.pth",
}

VDIFF_CONFIGS = {
    "yfcc_2": VDiffConfig("yfcc_2", 512, 64, (1, 2, 4, 8), (2, 3)),
    "yfcc_1": VDiffConfig("yfcc_1", 512, 64, (1, 2, 4, 8), (2, 3)),
    "cc12m_1": VDiffConfig("cc12m_1", 256, 64, (1, 2, 4, 8), (2, 3), clip_model="ViT-B/16"),
    "cc12m_1_cfg": VDiffConfig("cc12m_1_cfg", 256, 64, (1, 2, 4, 8), (2, 3), clip_model="ViT-B/16"),
    "danbooru_128": VDiffConfig("danbooru_128", 128, 64, (1, 2, 4), (2,)),
    "imagenet_128": VDiffConfig("imagenet_128", 128, 64, (1, 2, 4), (2,)),
    "wikiart_128": VDiffConfig("wikiart_128", 128, 64, (1, 2, 4), (2,)),
    "wikiart_256": VDiffConfig("wikiart_256", 256, 64, (1, 2, 4, 8), (2, 3)),
    # tiny model for CI
    "tiny_test": VDiffConfig("tiny_test", 64, 16, (1, 2), (1,)),
}


class FourierFeatures(nn.Module):
    out_features: int
    std: float = 16.0

    @nn.compact
    def __call__(self, t):
        w = self.param(
            "weight", nn.initializers.normal(self.std), (self.out_features // 2, 1)
        )
        f = 2 * math.pi * t.reshape(-1, 1) @ w.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class ResConvBlock(nn.Module):
    c_mid: int
    c_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.c_mid, (3, 3), padding=1)(x)
        h = nn.relu(h)
        h = nn.Conv(self.c_out, (3, 3), padding=1)(h)
        skip = x if x.shape[-1] == self.c_out else nn.Conv(self.c_out, (1, 1), use_bias=False)(x)
        return nn.relu(h + skip)


class SelfAttention2d(nn.Module):
    n_head: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        norm = nn.GroupNorm(num_groups=min(32, c // 4), epsilon=1e-6)(x)
        qkv = nn.Conv(c * 3, (1, 1))(norm).reshape(b, h * w, 3, self.n_head, c // self.n_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (c // self.n_head) ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1))(out)


class VDiffUNet(nn.Module):
    """Recursive skip-connection UNet with timestep (+optional clip) conditioning."""

    config: VDiffConfig

    @nn.compact
    def __call__(self, x, t, clip_embed=None):
        cfg = self.config
        # conditioning: Fourier timestep features (+ projected clip embed) mapped
        # to a vector, broadcast-concatenated at the input
        t_feat = FourierFeatures(64, name="timestep_embed")(jnp.atleast_1d(t))
        cond = nn.Dense(cfg.base_ch, name="t_proj")(t_feat)
        if cfg.clip_model is not None:
            ce = clip_embed if clip_embed is not None else jnp.zeros((1, cfg.clip_embed_dim))
            cond = cond + nn.Dense(cfg.base_ch, name="clip_proj")(ce)
        cond = nn.relu(cond)

        b, h, w, _ = x.shape
        cond_map = jnp.broadcast_to(cond[:, None, None, :], (b, h, w, cond.shape[-1]))
        hidden = jnp.concatenate([x, cond_map], axis=-1)

        depths = len(cfg.ch_mults)
        skips = []
        for d in range(depths):
            c = cfg.base_ch * cfg.ch_mults[d]
            hidden = ResConvBlock(c, c, name=f"down_{d}_res1")(hidden)
            hidden = ResConvBlock(c, c, name=f"down_{d}_res2")(hidden)
            if d in cfg.attn_depths:
                hidden = SelfAttention2d(name=f"down_{d}_attn")(hidden)
            if d != depths - 1:
                skips.append(hidden)
                hidden = nn.avg_pool(hidden, (2, 2), (2, 2))

        for d in range(depths - 2, -1, -1):
            c = cfg.base_ch * cfg.ch_mults[d]
            bh, hh, wh, _ = hidden.shape
            hidden = jax.image.resize(hidden, (bh, hh * 2, wh * 2, hidden.shape[-1]), "nearest")
            hidden = jnp.concatenate([hidden, skips.pop()], axis=-1)
            hidden = ResConvBlock(c, c, name=f"up_{d}_res1")(hidden)
            hidden = ResConvBlock(c, c, name=f"up_{d}_res2")(hidden)
            if d in cfg.attn_depths:
                hidden = SelfAttention2d(name=f"up_{d}_attn")(hidden)

        return nn.Conv(3, (3, 3), padding=1, name="out_conv")(hidden)


def load_vdiff_model(name: str):
    """Build the UNet; convert models/<name>.pth when present, else random init.

    Real checkpoint names (and the tiny_up* CI specs) run on the upstream-shaped
    executor (models/vdiff_upstream.py) whose layer map matches the published
    v-diffusion-pytorch module tree, so a downloaded ``.pth`` converts directly
    via ``convert_vdiff_state_dict``.  ``tiny_test`` keeps the compact flax
    VDiffUNet for fast CI."""
    import hashlib
    import os

    from pixray_tpu.models.vdiff_upstream import (
        UPSTREAM_SPECS,
        VDiffUpstream,
        convert_vdiff_state_dict,
        init_params,
    )

    key = jax.random.PRNGKey(
        int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "big") % (2**31)
    )

    if name in UPSTREAM_SPECS:
        spec = UPSTREAM_SPECS[name]
        model = VDiffUpstream(spec)
        ckpt = os.path.join(os.environ.get("PIXRAY_TPU_MODELS", "models"), f"{name}.pth")
        if not os.path.exists(ckpt) and name in VDIFF_CHECKPOINT_URLS:
            from pixray_tpu.utils.download import wget_file

            wget_file(VDIFF_CHECKPOINT_URLS[name], ckpt)
        if os.path.exists(ckpt):
            import torch

            sd = torch.load(ckpt, map_location="cpu")
            sd = sd.get("model", sd) if isinstance(sd, dict) else sd
            sd = {k: v.numpy() for k, v in sd.items()}
            variables = convert_vdiff_state_dict(sd, spec)
            print(f"loaded v-diffusion weights for {name} from {ckpt}")
        else:
            print(f"WARNING: v-diffusion weights for {name} not found — random init")
            variables = init_params(spec, key)
        return model, variables, spec

    cfg = VDIFF_CONFIGS[name]
    model = VDiffUNet(cfg)
    r = min(cfg.resolution, 64)
    clip_embed = jnp.zeros((1, cfg.clip_embed_dim)) if cfg.clip_model else None
    variables = model.init(key, jnp.zeros((1, r, r, 3)), jnp.zeros((1,)), clip_embed)
    print(f"WARNING: v-diffusion weights for {name} not found — random init")
    return model, variables, cfg
