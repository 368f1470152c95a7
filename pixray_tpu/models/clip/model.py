"""Flax CLIP: ViT and ModifiedResNet image towers + causal text tower.

TPU-native re-implementation of the perceptor models the reference loads through
the ``clip`` pip package (/root/reference/slip.py:173-186).  Design notes:

- channels-last (NHWC) throughout; patch embedding is one big reshaped matmul;
- parameters live in fp32; matmuls run in a configurable ``dtype`` (bf16 by
  default on TPU) with fp32 accumulation (``preferred_element_type``);
- LayerNorm/softmax always compute in fp32 for stability;
- attention uses packed qkv projections matching OpenAI parameter layout, so the
  weight converter is a pure renaming.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import CLIPConfig


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _patchify(x, gh, gw, p):
    """(B, gh*p, gw*p, 3) -> (B, gh*gw, p*p*3) patch extraction.

    custom_vjp so the BACKWARD's inverse reshape/transpose runs at the input's
    dtype: the patch-embedding dot keeps preferred_element_type=f32, so its
    transpose emits an f32 cotangent — without the cast here the whole bwd
    patchify relayout (the profiled f32[B,gh,gw,p,p,3] copies) pays double
    the bytes of the bf16 forward for gradient bits the bf16 warp backward
    discards anyway."""
    b = x.shape[0]
    xp = x.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(b, gh * gw, p * p * 3)


def _patchify_fwd(x, gh, gw, p):
    # zero-size token just to carry the primal dtype through the residuals
    return _patchify(x, gh, gw, p), jnp.zeros((0,), x.dtype)


def _patchify_bwd(gh, gw, p, res, g):
    b = g.shape[0]
    # barrier: XLA freely commutes converts across reshapes/transposes and was
    # observed hoisting this cast PAST the whole inverse relayout, running the
    # (B, gh, gw, p, p, 3) copies in f32 — double the bytes for gradient bits
    # the bf16 warp backward discards anyway.  Pinning the cast keeps the
    # relayout at the compute dtype.
    g = jax.lax.optimization_barrier(g.astype(res.dtype))
    gx = g.reshape(b, gh, gw, p, p, 3).transpose(0, 1, 3, 2, 4, 5)
    return (gx.reshape(b, gh * p, gw * p, 3),)


_patchify.defvjp(_patchify_fwd, _patchify_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _patchify_cm(x, gh, gw, p):
    """(B, 3, gh*p, gw*p) channel-major -> (B, gh*gw, 3*p*p) patch extraction.

    Row order of the patch vector is (c, py, px) — channel SLOWEST — so the
    patch-embedding kernel's rows must be permuted to match (see
    ``_kernel_cm``).  This is the fast lane for the engine's channel-major
    cutout banks: the bank arrives in the warp kernel's native (N, C, H, W)
    layout and is patchified with ONE relayout, instead of the NHWC path's
    bank transpose + patch transpose."""
    b = x.shape[0]
    xp = x.reshape(b, 3, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
    return xp.reshape(b, gh * gw, 3 * p * p)


def _patchify_cm_fwd(x, gh, gw, p):
    return _patchify_cm(x, gh, gw, p), jnp.zeros((0,), x.dtype)


def _patchify_cm_bwd(gh, gw, p, res, g):
    b = g.shape[0]
    g = jax.lax.optimization_barrier(g.astype(res.dtype))
    gx = g.reshape(b, gh, gw, 3, p, p).transpose(0, 3, 1, 4, 2, 5)
    return (gx.reshape(b, 3, gh * p, gw * p),)


_patchify_cm.defvjp(_patchify_cm_fwd, _patchify_cm_bwd)


def _kernel_rows_cm(kernel, p):
    """Permute (p*p*3, width) patch-kernel rows from (py, px, c) order
    (channels-fastest, the NHWC patch flattening) to (c, py, px) order
    (channel-major patches).  Static weight-space op — free at step time."""
    width = kernel.shape[-1]
    return kernel.reshape(p, p, 3, width).transpose(2, 0, 1, 3).reshape(3 * p * p, width)


class LayerNorm(nn.Module):
    """LayerNorm in the input dtype, returning the input dtype.

    Default bf16-native: the tower's matmuls already run the int8 rung, whose
    quantization error (~1e-2 relative) dominates bf16 normalization error
    (~4e-3) by an order — f32 LN buys no accuracy the ladder gate can see but
    costs ~3% of the step in f32 materialization between the fused matmuls
    (A/B: 57.6/58.9 steps/s bf16-LN on *more throttled* chips vs 57.0/56.4
    f32-LN; tools/exp18 ladder gap unchanged).  PIXRAY_TPU_CLIP_LN32=1
    restores the torch reference's fp32-stats behavior
    (/root/reference notation: CLIP LayerNorm subclass casting to fp32)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        import os

        orig_dtype = x.dtype
        if os.environ.get("PIXRAY_TPU_CLIP_LN32", "0") != "0":
            x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (y * scale + bias).astype(orig_dtype)


class QuantDense(nn.Module):
    """Dense with an optional int8-forward/bf16-backward matmul.

    Parameter names/layout match nn.Dense exactly (the weight converters are
    untouched); ``quant='none'`` reproduces nn.Dense's compute-dtype math
    bitwise.  ``quant='int8'`` routes the forward through
    ops/quant.int8_matmul — the same dynamic-quantization rung (and the same
    numerics-gate guard) as the warp kernel's int8 forward."""

    features: int
    dtype: Any = jnp.float32
    quant: str = "none"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        if self.quant.startswith("int8"):
            bwd = "int8" if self.quant == "int8b" else "bf16"
            if self.has_variable("quant", "kernel_q"):
                # pre-quantized s8 weight refs (perceptor load-time,
                # ops/quant.py prequantize_kernel): the step quantizes
                # activations only — no per-step weight absmax/round, and
                # the blocked dispatch carries s8 instead of bf16 weights
                from pixray_tpu.ops.quant import int8_matmul_pre

                wq = self.get_variable("quant", "kernel_q")
                sw = self.get_variable("quant", "kernel_s")
                y = int8_matmul_pre(x, wq, sw, bwd).astype(self.dtype)
            else:
                from pixray_tpu.ops.quant import int8_matmul

                y = int8_matmul(x, kernel, bwd).astype(self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class MultiHeadAttention(nn.Module):
    """Packed-qkv multi-head attention (torch nn.MultiheadAttention layout)."""

    num_heads: int
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, T, D)
        d = x.shape[-1]
        qkv = QuantDense(3 * d, dtype=self.dtype, quant=self.quant, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        b, t, _ = x.shape
        h = self.num_heads
        hd = d // h
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)

        import os

        if os.environ.get("PIXRAY_TPU_CLIP_ATTN", "fused") == "einsum":
            # plain batched attention: at CLIP's tiny sequence lengths (50/77
            # tokens) the flash-style fused kernel's chunking machinery can
            # cost more than the O(T^2) memory it saves (perf knob)
            scale = hd ** -0.5
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                causal = jnp.tril(jnp.ones((t, t), bool))
                scores = jnp.where(causal[None, None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32)
        else:
            # jax.nn.dot_product_attention picks the fused TPU attention path;
            # causal masking (text tower) passed as is_causal
            out = jax.nn.dot_product_attention(
                q, k, v, is_causal=(mask is not None)
            )
        out = out.astype(x.dtype).reshape(b, t, d)
        return QuantDense(d, dtype=self.dtype, quant=self.quant, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32
    act: str = "quick_gelu"  # timm-style (SLIP) trunks use exact gelu
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask=None):
        d = x.shape[-1]
        x = x + MultiHeadAttention(
            self.num_heads, dtype=self.dtype, quant=self.quant, name="attn"
        )(LayerNorm(name="ln_1")(x), mask)
        h = LayerNorm(name="ln_2")(x)
        h = QuantDense(4 * d, dtype=self.dtype, quant=self.quant, name="mlp_fc")(h)
        h = quick_gelu(h) if self.act == "quick_gelu" else jax.nn.gelu(h, approximate=False)
        h = QuantDense(d, dtype=self.dtype, quant=self.quant, name="mlp_proj")(h)
        return x + h


class Transformer(nn.Module):
    layers: int
    num_heads: int
    dtype: Any = jnp.float32
    act: str = "quick_gelu"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask=None):
        import os

        block_cls = ResidualAttentionBlock
        if os.environ.get("PIXRAY_TPU_CLIP_REMAT") == "1":
            # rematerialize each block's activations in the backward pass:
            # trades recompute FLOPs for HBM traffic (perf experiment knob)
            block_cls = nn.remat(ResidualAttentionBlock)
        for i in range(self.layers):
            x = block_cls(
                self.num_heads, dtype=self.dtype, act=self.act,
                quant=self.quant, name=f"resblock_{i}"
            )(x, mask)
        return x


class VisionTransformer(nn.Module):
    config: CLIPConfig
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, images, in_affine=None, data_format="NHWC"):
        """images: (B, H, W, 3) — or (B, 3, H, W) with ``data_format='NCHW'``,
        the engine's channel-major cutout-bank fast lane (channel-major
        patchify + permuted kernel rows; identical math, one less full-bank
        relayout each pass).  Preprocessed/normalized when ``in_affine`` is
        None; raw resized [0,1] images with the preprocessing affine supplied
        via ``in_affine`` otherwise.

        in_affine: optional per-channel input affine ``(scale(3,), shift(3,))``
        such that the preprocessed input is ``images * scale + shift``.  The
        affine is FOLDED into the patch-embedding matmul (per-channel row
        scaling of the kernel plus a constant token bias) instead of being
        materialized as (B, H, W, 3) elementwise passes — the range-stretch +
        standardize of the reference preprocessing (slip.py:21-42, 173-186)
        then costs two weight-space ops per call instead of two full-batch
        HBM read/write passes forward and two more in the backward.
        """
        cfg = self.config
        timm_style = cfg.vision_style == "timm"
        p = cfg.vision_patch_size
        width = cfg.vision_width
        nchw = data_format == "NCHW"
        if nchw:
            b, _, hgt, wdt = images.shape
        else:
            b, hgt, wdt, _ = images.shape
        gh, gw = hgt // p, wdt // p

        # patch embedding as one matmul: (B, gh, gw, p*p*3) @ (p*p*3, width).
        # Cast BEFORE the patchify reshape/transpose: the cast commutes with
        # layout ops exactly, and the transpose's device copies run at half
        # the bytes in bf16 (profiled ~2-3 ms/step of f32 layout copies here).
        if nchw:
            x = _patchify_cm(images.astype(self.dtype), gh, gw, p)
        else:
            x = _patchify(images.astype(self.dtype), gh, gw, p)
        patch_kernel = self.param(
            "patch_embedding",
            nn.initializers.lecun_normal(),
            (p * p * 3, width),
        )
        quant_on = self.quant.startswith("int8")
        bwd = "int8" if self.quant == "int8b" else "bf16"
        patch_q_name = "patch_q_cm" if nchw else "patch_q"
        # pre-quantized patch kernel (perceptor load-time): the affine fold
        # moves to the ACTIVATION side — x @ (s·W) == (x*s) @ W exactly, and
        # the per-row dynamic activation quantize absorbs the multiply — so
        # the s8 kernel stays step-invariant even though the affine's scale
        # is a per-call value (the batch min/max range stretch)
        use_pre = quant_on and self.has_variable("quant", patch_q_name)
        aff_bias = None
        scale_rows = None
        if in_affine is not None:
            scale, shift = in_affine
            # the (p, p, 3) patch flattens channel-fastest: tile the 3-vectors
            # (repeat for the channel-major row order instead)
            if nchw:
                scale_rows = jnp.repeat(scale.astype(jnp.float32), p * p)
            else:
                scale_rows = jnp.tile(scale.astype(jnp.float32), p * p)  # (p*p*3,)
            shift_rows = jnp.tile(shift.astype(jnp.float32), p * p)
            aff_bias = jnp.dot(shift_rows, patch_kernel)  # (width,) f32
        if use_pre:
            from pixray_tpu.ops.quant import int8_matmul_pre

            if scale_rows is not None:
                x = x * scale_rows.astype(jnp.float32)
            wq = self.get_variable("quant", patch_q_name)
            sw = self.get_variable("quant", "patch_s_cm" if nchw else "patch_s")
            x = int8_matmul_pre(x, wq, sw, bwd)
        else:
            kernel_base = _kernel_rows_cm(patch_kernel, p) if nchw else patch_kernel
            if scale_rows is not None:
                kernel_eff = (kernel_base * scale_rows[:, None]).astype(self.dtype)
            else:
                kernel_eff = kernel_base.astype(self.dtype)
            if quant_on:
                from pixray_tpu.ops.quant import int8_matmul

                x = int8_matmul(x, kernel_eff, bwd)
            else:
                x = jnp.dot(x, kernel_eff, preferred_element_type=jnp.float32)
        if aff_bias is not None:
            x = x + aff_bias[None, None, :]
        x = x.astype(self.dtype)
        if timm_style:  # timm patch conv carries a bias; OpenAI's does not
            x = x + self.param("patch_bias", nn.initializers.zeros, (width,)).astype(self.dtype)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (width,))
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, width))
        x = jnp.concatenate([cls, x], axis=1)

        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (gh * gw + 1, width)
        )
        x = x + pos.astype(self.dtype)
        if not timm_style:  # timm ViTs have no pre-transformer LayerNorm
            x = LayerNorm(name="ln_pre")(x)
        x = Transformer(
            cfg.vision_layers, cfg.vision_heads, dtype=self.dtype,
            act="gelu" if timm_style else "quick_gelu", quant=self.quant,
            name="transformer",
        )(x)
        x = LayerNorm(name="ln_post")(x[:, 0, :])

        proj = self.param(
            "proj", nn.initializers.normal(0.02), (width, cfg.embed_dim)
        )
        return jnp.dot(x.astype(self.dtype), proj.astype(self.dtype), preferred_element_type=jnp.float32)


class Bottleneck(nn.Module):
    """ModifiedResNet bottleneck: avgpool-based (anti-aliased) downsampling."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = 4
        inplanes = x.shape[-1]
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME" if k > 1 else "VALID", use_bias=False, dtype=self.dtype, name=name
        )
        bn = lambda name: nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name=name)

        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = bn("bn3")(conv(self.planes * expansion, 1, "conv3")(out))

        if self.stride > 1 or inplanes != self.planes * expansion:
            identity = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride)) if self.stride > 1 else x
            identity = bn("downsample_bn")(conv(self.planes * expansion, 1, "downsample_conv")(identity))
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    num_heads: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        mean = jnp.mean(x, axis=1, keepdims=True)
        x = jnp.concatenate([mean, x], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (h * w + 1, c)
        )
        x = (x + pos.astype(x.dtype)).astype(self.dtype)

        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)

        hd = c // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q / jnp.sqrt(hd).astype(q.dtype), k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, 1, c)
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    config: CLIPConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        width = cfg.vision_width
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name=name
        )
        bn = lambda name: nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name=name)

        x = images.astype(self.dtype)
        x = nn.relu(bn("bn1")(conv(width // 2, 3, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(width // 2, 3, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(width, 3, 1, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, blocks in enumerate(cfg.vision_layers):
            planes = width * (2**stage)
            for blk in range(blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(planes, stride, dtype=self.dtype, name=f"layer{stage + 1}_{blk}")(x)

        heads = width * 32 // 64
        return AttentionPool2d(heads, cfg.embed_dim, dtype=self.dtype, name="attnpool")(x)


class TextTransformer(nn.Module):
    config: CLIPConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, pool_indices=None):
        """pool_indices: optional (B,) positions to pool at instead of
        argmax(tokens) — the reference's '=' stop-encoding shim
        (pixray.py:864-870 passes eot_index-1)."""
        cfg = self.config
        emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.text_width)
        )
        x = emb[tokens].astype(self.dtype)  # (B, T, W)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.text_width)
        )
        x = x + pos[: x.shape[1]].astype(self.dtype)

        t = x.shape[1]
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1)
        x = Transformer(cfg.text_layers, cfg.text_heads, dtype=self.dtype, name="transformer")(x, mask)
        x = LayerNorm(name="ln_final")(x)

        eot = jnp.argmax(tokens, axis=-1) if pool_indices is None else pool_indices
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (cfg.text_width, cfg.embed_dim)
        )
        return jnp.dot(x.astype(self.dtype), proj.astype(self.dtype), preferred_element_type=jnp.float32)


class CLIP(nn.Module):
    """Full CLIP: ``encode_image`` / ``encode_text`` via method selection."""

    config: CLIPConfig
    dtype: Any = jnp.float32
    # "int8": vision-tower matmuls run the dynamically-quantized int8 forward
    # (ops/quant.py) with the bf16 straight-through backward; the text tower
    # (one-shot, host-side at init) always stays at the compute dtype
    quant: str = "none"

    def setup(self):
        if self.config.vision_kind == "vit":
            self.visual = VisionTransformer(self.config, dtype=self.dtype,
                                            quant=self.quant)
        else:
            self.visual = ModifiedResNet(self.config, dtype=self.dtype)
        self.text = TextTransformer(self.config, dtype=self.dtype)

    def encode_image(self, images, in_affine=None, data_format="NHWC"):
        if self.config.vision_kind != "vit":
            if data_format == "NCHW":  # ResNet towers are NHWC (conv layouts)
                images = images.transpose(0, 2, 3, 1)
            if in_affine is not None:
                # ResNet towers start with strided convs; materialize the affine
                scale, shift = in_affine
                images = images.astype(jnp.float32) * scale + shift
            return self.visual(images)
        if in_affine is not None:
            return self.visual(images, in_affine, data_format)
        return self.visual(images, data_format=data_format)

    def encode_text(self, tokens):
        return self.text(tokens)

    def encode_text_at(self, tokens, pool_indices):
        return self.text(tokens, pool_indices)

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)
