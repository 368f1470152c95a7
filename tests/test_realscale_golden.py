"""Real-scale asset-free golden parity: FULL-SIZE random-weight torch models
vs the converted Flax towers.

The toy-scale golden tests (tests/test_clip.py, test_vdiff_golden.py) prove
the math; these prove it at the real checkpoint configurations — full-size
random-weight torch↔Flax parity catches converter/shape/precision bugs tiny
mirrors can't (a transposed attention placement or channel split can
approximately conserve parameter count; it cannot conserve full-scale
outputs).  This is the strongest de-risk of asset day available in a
zero-egress environment: when a real OpenAI/taming checkpoint lands, only the
values change, never the mapping.

Covers (reference contracts in parens):
- ViT-B/32 at its real configuration vs HF transformers CLIPModel
  (/root/reference/slip.py:44-74, 173-186)
- RN50 (ModifiedResNet) at its real configuration vs an independent torch
  mirror written to the published OpenAI CLIP semantics, exported through the
  OpenAI state-dict naming the production converter consumes
  (/root/reference/slip.py:174-181)
- the imagenet-f16 VQGAN decoder at real channel widths vs an independent
  torch mirror of taming-transformers' decoder (/root/reference/vqgan.py:190-195)
- one yfcc_2-width v-diffusion block stack (2048-channel ResConvBlocks +
  32-head SelfAttention2d) through the spec/converter/executor pipeline
  (/root/reference/vdiff.py:24-33)

All tests run on CPU with random weights; each takes seconds to ~1 minute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _cosine(a, b):
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


# =========================================================================
# 1. ViT-B/32 at full scale vs HF transformers CLIPModel
# =========================================================================
class TestViTB32FullScale:
    @pytest.fixture(scope="class")
    def pair(self):
        import transformers

        from pixray_tpu.models.clip.configs import CLIP_CONFIGS
        from pixray_tpu.models.clip.convert import convert_hf_clip
        from pixray_tpu.models.clip.model import CLIP

        cfg = CLIP_CONFIGS["ViT-B/32"]
        hf_config = transformers.CLIPConfig(
            projection_dim=cfg.embed_dim,
            vision_config=dict(
                hidden_size=cfg.vision_width, intermediate_size=4 * cfg.vision_width,
                num_hidden_layers=cfg.vision_layers, num_attention_heads=cfg.vision_heads,
                image_size=cfg.image_resolution, patch_size=cfg.vision_patch_size,
                hidden_act="quick_gelu", projection_dim=cfg.embed_dim,
            ),
            text_config=dict(
                hidden_size=cfg.text_width, intermediate_size=4 * cfg.text_width,
                num_hidden_layers=cfg.text_layers, num_attention_heads=cfg.text_heads,
                vocab_size=cfg.vocab_size, max_position_embeddings=cfg.context_length,
                hidden_act="quick_gelu", projection_dim=cfg.embed_dim,
                # OpenAI pools text features at argmax(token_id) (the EOT
                # token); HF pools at eos_token_id — align for the comparison
                eos_token_id=cfg.vocab_size - 1,
            ),
        )
        torch.manual_seed(0)
        hf_model = transformers.CLIPModel(hf_config).eval()
        sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
        variables = convert_hf_clip(sd, cfg)
        flax_model = CLIP(cfg, dtype=jnp.float32)
        return hf_model, flax_model, variables, cfg

    def test_image_embedding_parity(self, pair):
        hf_model, flax_model, variables, cfg = pair
        rng = np.random.default_rng(1)
        img = rng.standard_normal(
            (2, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32)

        ours = np.asarray(
            flax_model.apply(variables, jnp.asarray(img), method=flax_model.encode_image)
        )
        with torch.no_grad():
            theirs = hf_model.get_image_features(
                pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2))
            ).numpy()
        assert np.isfinite(ours).all()
        assert np.all(_cosine(ours, theirs) > 0.999)

    def test_text_embedding_parity(self, pair):
        hf_model, flax_model, variables, cfg = pair
        rng = np.random.default_rng(2)
        tokens = rng.integers(1, cfg.vocab_size - 1, (2, cfg.context_length)).astype(np.int32)
        tokens[:, 7] = cfg.vocab_size - 1  # EOT = max id, pooled by both sides

        ours = np.asarray(
            flax_model.apply(variables, jnp.asarray(tokens), method=flax_model.encode_text)
        )
        with torch.no_grad():
            theirs = hf_model.get_text_features(
                input_ids=torch.from_numpy(tokens.astype(np.int64))
            ).numpy()
        assert np.isfinite(ours).all()
        assert np.all(_cosine(ours, theirs) > 0.999)

    def test_gradient_flows_at_full_scale(self, pair):
        _, flax_model, variables, cfg = pair

        def loss(img):
            e = flax_model.apply(variables, img, method=flax_model.encode_image)
            return jnp.sum(e**2)

        img = jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3)) * 0.5
        g = jax.grad(loss)(img)
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)


# =========================================================================
# 2. RN50 (ModifiedResNet) at full scale vs an independent torch mirror
# =========================================================================
class _TorchBottleneck(tnn.Module):
    """OpenAI CLIP ModifiedResNet bottleneck (anti-aliased: stride-s conv is
    replaced by avgpool(s) after conv2 / in the downsample branch)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            from collections import OrderedDict

            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()),
                ("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchAttentionPool2d(tnn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.c_proj = tnn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):  # (B, C, H, W)
        b, c, h, w = x.shape
        x = x.flatten(2).permute(0, 2, 1)  # (B, HW, C)
        x = torch.cat([x.mean(dim=1, keepdim=True), x], dim=1)
        x = x + self.positional_embedding[None]
        q, k, v = self.q_proj(x[:, :1]), self.k_proj(x), self.v_proj(x)
        hd = c // self.num_heads
        q = q.view(b, 1, self.num_heads, hd).transpose(1, 2)
        k = k.view(b, -1, self.num_heads, hd).transpose(1, 2)
        v = v.view(b, -1, self.num_heads, hd).transpose(1, 2)
        attn = ((q / hd**0.5) @ k.transpose(-1, -2)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, 1, c)
        return self.c_proj(out)[:, 0]


class _TorchModifiedResNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.vision_width
        self.conv1 = tnn.Conv2d(3, w // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w // 2)
        self.conv2 = tnn.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w // 2)
        self.conv3 = tnn.Conv2d(w // 2, w, 3, padding=1, bias=False)
        self.bn3 = tnn.BatchNorm2d(w)
        self.relu = tnn.ReLU()
        self.avgpool = tnn.AvgPool2d(2)
        inplanes = w
        for stage, blocks in enumerate(cfg.vision_layers):
            planes = w * (2**stage)
            layer = []
            for blk in range(blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                layer.append(_TorchBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*layer))
        heads = w * 32 // 64
        self.attnpool = _TorchAttentionPool2d(
            cfg.image_resolution // 32, w * 32, heads, cfg.embed_dim
        )
        self.n_stages = len(cfg.vision_layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for i in range(self.n_stages):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.attnpool(x)


class TestRN50FullScale:
    @pytest.fixture(scope="class")
    def pair(self):
        from pixray_tpu.models import signatures as S
        from pixray_tpu.models.clip.configs import CLIP_CONFIGS
        from pixray_tpu.models.clip.convert import convert_openai_clip
        from pixray_tpu.models.clip.model import CLIP

        cfg = CLIP_CONFIGS["RN50"]
        torch.manual_seed(3)
        mirror = _TorchModifiedResNet(cfg)
        # randomize BN running stats too — a converter that drops or swaps
        # them would still pass with the all-zeros/ones defaults
        for m in mirror.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
        mirror.eval()

        # full OpenAI-format state dict: random text tower from the spec
        # signature, visual tower from the torch mirror
        sd = dict(S.openai_clip_signature(cfg))
        for k, v in mirror.state_dict().items():
            if "num_batches_tracked" in k:
                continue
            key = f"visual.{k}"
            assert key in sd and tuple(sd[key].shape) == tuple(v.shape), (
                f"mirror/signature key mismatch: {key} "
                f"{tuple(v.shape)} vs {tuple(sd.get(key, np.zeros(0)).shape)}"
            )
            sd[key] = v.detach().numpy()

        variables = convert_openai_clip(sd, cfg)
        flax_model = CLIP(cfg, dtype=jnp.float32)
        return mirror, flax_model, variables, cfg

    def test_image_embedding_parity(self, pair):
        mirror, flax_model, variables, cfg = pair
        rng = np.random.default_rng(4)
        img = rng.standard_normal(
            (2, cfg.image_resolution, cfg.image_resolution, 3)
        ).astype(np.float32)

        ours = np.asarray(
            flax_model.apply(variables, jnp.asarray(img), method=flax_model.encode_image)
        )
        with torch.no_grad():
            theirs = mirror(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        assert np.isfinite(ours).all()
        assert np.all(_cosine(ours, theirs) > 0.999)

    def test_gradient_flows_at_full_scale(self, pair):
        _, flax_model, variables, cfg = pair

        def loss(img):
            e = flax_model.apply(variables, img, method=flax_model.encode_image)
            return jnp.sum(e**2)

        g = jax.grad(loss)(
            jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3)) * 0.5
        )
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)


# =========================================================================
# 3. imagenet-f16 VQGAN decoder at real channel widths vs a torch mirror
# =========================================================================
def _swish(x):
    return x * torch.sigmoid(x)


class _TResnetBlock(tnn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, c_in, eps=1e-6)
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, c_out, eps=1e-6)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.nin_shortcut = tnn.Conv2d(c_in, c_out, 1)
        self._has_short = c_in != c_out

    def forward(self, x):
        h = self.conv1(_swish(self.norm1(x)))
        h = self.conv2(_swish(self.norm2(h)))
        return (self.nin_shortcut(x) if self._has_short else x) + h


class _TAttnBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(hn).reshape(b, c, h * w).permute(0, 2, 1)
        v = self.v(hn).reshape(b, c, h * w).permute(0, 2, 1)
        attn = torch.softmax((q @ k.transpose(1, 2)) * c**-0.5, dim=-1)
        out = (attn @ v).permute(0, 2, 1).reshape(b, c, h, w)
        return x + self.proj_out(out)


class _TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest"))


class _TorchTamingDecoder(tnn.Module):
    """Independent torch mirror of taming-transformers' decoder (state-dict
    key layout `decoder.*` + `post_quant_conv` per the taming convention)."""

    def __init__(self, cfg):
        super().__init__()
        n = cfg.num_resolutions
        block_in = cfg.ch * cfg.ch_mult[-1]
        self.post_quant_conv = tnn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
        self.conv_in = tnn.Conv2d(cfg.z_channels, block_in, 3, padding=1)
        self.mid = tnn.Module()
        self.mid.block_1 = _TResnetBlock(block_in, block_in)
        self.mid.attn_1 = _TAttnBlock(block_in)
        self.mid.block_2 = _TResnetBlock(block_in, block_in)
        self.up = tnn.ModuleList()
        cur_res = cfg.resolution // (2 ** (n - 1))
        self._plan = []
        for i in reversed(range(n)):
            up = tnn.Module()
            up.block = tnn.ModuleList()
            up.attn = tnn.ModuleList()
            out_ch = cfg.ch * cfg.ch_mult[i]
            has_attn = cur_res in cfg.attn_resolutions
            for _j in range(cfg.num_res_blocks + 1):
                up.block.append(_TResnetBlock(block_in, out_ch))
                block_in = out_ch
                if has_attn:
                    up.attn.append(_TAttnBlock(out_ch))
            if i != 0:
                up.upsample = _TUpsample(out_ch)
                cur_res *= 2
            self.up.insert(0, up)
        self.norm_out = tnn.GroupNorm(32, block_in, eps=1e-6)
        self.conv_out = tnn.Conv2d(block_in, 3, 3, padding=1)
        self.n = n

    def forward(self, z_q):
        h = self.conv_in(self.post_quant_conv(z_q))
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(self.n)):
            up = self.up[i]
            for j, block in enumerate(up.block):
                h = block(h)
                if len(up.attn) > 0:
                    h = up.attn[j](h)
            if i != 0:
                h = up.upsample(h)
        return self.conv_out(_swish(self.norm_out(h)))


class TestVQGANDecoderFullScale:
    def test_decode_parity_real_widths(self):
        from pixray_tpu.models import signatures as S
        from pixray_tpu.models.vqgan import VQGAN, VQGAN_CONFIGS, convert_taming_vqgan

        cfg = VQGAN_CONFIGS["imagenet_f16_16384"]
        torch.manual_seed(5)
        mirror = _TorchTamingDecoder(cfg).eval()

        # full taming state dict: encoder/quantizer from the spec signature,
        # the decoder + post_quant_conv from the torch mirror
        sd = dict(S.taming_vqgan_signature(cfg))
        for k, v in mirror.state_dict().items():
            key = k if k.startswith("post_quant_conv") else f"decoder.{k}"
            assert key in sd and tuple(sd[key].shape) == tuple(v.shape), (
                f"mirror/signature key mismatch: {key} {tuple(v.shape)} vs "
                f"{tuple(sd.get(key, np.zeros(0)).shape)}"
            )
            sd[key] = v.detach().numpy()

        variables = convert_taming_vqgan(sd, cfg)
        model = VQGAN(cfg, dtype=jnp.float32)

        # an 8x8 latent keeps CPU time low; channel widths stay real (the
        # decoder is fully convolutional — attn placement is config-driven on
        # both sides, so the comparison is apples-to-apples)
        rng = np.random.default_rng(6)
        z_q = rng.standard_normal((1, 8, 8, cfg.embed_dim)).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.asarray(z_q), method=model.decode))
        with torch.no_grad():
            theirs = (
                mirror(torch.from_numpy(z_q.transpose(0, 3, 1, 2)))
                .permute(0, 2, 3, 1)
                .numpy()
            )
        assert ours.shape == theirs.shape == (1, 128, 128, 3)
        assert np.isfinite(ours).all()
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


# =========================================================================
# 4. yfcc_2-width v-diffusion block stack through spec/converter/executor
# =========================================================================
class TestVdiffYfccWidthBlock:
    def test_pred_parity_at_yfcc_width(self):
        """One level of yfcc_2's innermost trunk at its REAL width (16*128 =
        2048-channel ResConvBlocks with 32-head SelfAttention2d), run through
        the same spec → torch-mirror → converter → JAX-executor pipeline as
        the tiny golden tests."""
        from pixray_tpu.models.vdiff_upstream import (
            VDiffUpstream,
            build_spec,
            convert_vdiff_state_dict,
            expected_state_shapes,
        )
        from tests.test_vdiff_golden import TorchUpstream

        # yfcc_2 cs[-1] = 16*_C = 2048, attention at the innermost level
        spec = build_spec("yfcc2_inner_block", 8, (2048,), (0,), "conv",
                          n_blocks=2, n_inner=2)
        torch.manual_seed(8)
        mirror = TorchUpstream(spec).eval()
        got = {k: tuple(v.shape) for k, v in mirror.state_dict().items()}
        assert got == expected_state_shapes(spec)

        sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
        params = convert_vdiff_state_dict(sd, spec)

        rng = np.random.default_rng(9)
        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        t = np.array([0.4], dtype=np.float32)
        with torch.no_grad():
            ref = (
                mirror(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t))
                .permute(0, 2, 3, 1)
                .numpy()
            )
        out = np.asarray(VDiffUpstream(spec).apply(params, x, t))
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-3)
