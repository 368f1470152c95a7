"""CLIP tower tests: golden comparison against torch (HF transformers) with shared
random weights, converter structural checks, tokenizer behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pixray_tpu.models.clip.configs import CLIPConfig
from pixray_tpu.models.clip.model import CLIP


def tiny_vit_config():
    return CLIPConfig(
        name="tiny-vit", embed_dim=48, image_resolution=32, vision_kind="vit",
        vision_width=64, vision_layers=2, vision_patch_size=8, vision_heads=2,
        context_length=16, vocab_size=64, text_width=32, text_heads=2, text_layers=2,
    )


def tiny_rn_config():
    return CLIPConfig(
        name="tiny-rn", embed_dim=32, image_resolution=32, vision_kind="resnet",
        vision_width=8, vision_layers=(1, 1, 1, 1), vision_patch_size=None,
        vision_heads=4, context_length=16, vocab_size=64, text_width=32,
        text_heads=2, text_layers=2,
    )


class TestGoldenVsTorch:
    """Numerical parity with HuggingFace CLIPModel under shared random weights."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch = pytest.importorskip("torch")
        import transformers

        cfg = tiny_vit_config()
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
                # OpenAI pools text features at argmax(token_id) (the EOT token);
                # HF pools at eos_token_id — align them for the golden comparison
                eos_token_id=cfg.vocab_size - 1,
            ),
        )
        torch.manual_seed(0)
        hf_model = transformers.CLIPModel(hf_config).eval()

        from pixray_tpu.models.clip.convert import convert_hf_clip

        sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
        variables = convert_hf_clip(sd, cfg)
        flax_model = CLIP(cfg, dtype=jnp.float32)
        return hf_model, flax_model, variables, cfg

    def test_image_tower_matches(self, pair):
        import torch

        hf_model, flax_model, variables, cfg = pair
        rng = np.random.default_rng(1)
        img = rng.standard_normal((2, cfg.image_resolution, cfg.image_resolution, 3)).astype(np.float32)

        ours = np.asarray(
            flax_model.apply(variables, jnp.asarray(img), method=flax_model.encode_image)
        )
        theirs = hf_model.get_image_features(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).detach().numpy()
        # torch-CPU convs take a oneDNN fast path with relaxed accumulation, so we
        # bound absolute error and direction rather than elementwise relative error
        assert np.abs(ours - theirs).max() < 1e-2
        cos = (ours * theirs).sum(-1) / (np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1))
        assert np.all(cos > 0.99999)

    def test_text_tower_matches(self, pair):
        import torch

        hf_model, flax_model, variables, cfg = pair
        rng = np.random.default_rng(2)
        # EOT pooling uses argmax(tokens): make the last real token the largest id
        tokens = rng.integers(1, cfg.vocab_size - 1, (2, cfg.context_length)).astype(np.int32)
        tokens[:, 5] = cfg.vocab_size - 1

        ours = np.asarray(
            flax_model.apply(variables, jnp.asarray(tokens), method=flax_model.encode_text)
        )
        theirs = hf_model.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).detach().numpy()
        assert np.abs(ours - theirs).max() < 5e-2
        cos = (ours * theirs).sum(-1) / (np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1))
        assert np.all(cos > 0.9999)

    def test_image_tower_gradient_flows(self, pair):
        _, flax_model, variables, cfg = pair

        def loss(img):
            e = flax_model.apply(variables, img, method=flax_model.encode_image)
            return jnp.sum(e**2)

        img = jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3)) * 0.5
        g = jax.grad(loss)(img)
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)


def _openai_style_state_dict(cfg, rng):
    """Shared spec-side signature (models/signatures.py) — also used by the
    asset-free converter audit in tools/validate_weights.py."""
    from pixray_tpu.models.signatures import openai_clip_signature

    return openai_clip_signature(cfg, rng)


@pytest.mark.parametrize("cfg_fn", [tiny_vit_config, tiny_rn_config])
def test_openai_converter_matches_init_tree(cfg_fn):
    """convert_openai_clip must produce exactly the tree model.init builds."""
    from pixray_tpu.models.clip.convert import convert_openai_clip

    cfg = cfg_fn()
    rng = np.random.default_rng(0)
    variables = convert_openai_clip(_openai_style_state_dict(cfg, rng), cfg)

    model = CLIP(cfg, dtype=jnp.float32)
    ref = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.zeros((1, cfg.context_length), dtype=jnp.int32),
    )

    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(got_shapes)[0]
    assert {str(k): v for k, v in ref_flat} == {str(k): v for k, v in got_flat}

    # converted weights must actually run
    img = jnp.ones((1, cfg.image_resolution, cfg.image_resolution, 3)) * 0.3
    out = model.apply(variables, img, method=model.encode_image)
    assert out.shape == (1, cfg.embed_dim)
    assert jnp.all(jnp.isfinite(out))


class TestInt8Quant:
    """The int8-forward/bf16-backward vision-tower rung (ops/quant.py,
    PIXRAY_TPU_CLIP_PREC=int8) — same precision-ladder contract as the warp
    kernel's int8 forward: small bounded forward error, exact-shaped gradient
    flow, bitwise-default when off."""

    def test_int8_matmul_error_bound(self):
        from pixray_tpu.ops.quant import int8_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32))
        exact = np.asarray(x @ w)
        got = np.asarray(int8_matmul(x, w))
        denom = np.abs(exact).max()
        assert np.abs(got - exact).max() / denom < 2e-2

    def test_int8_matmul_backward_is_bf16_ste(self):
        from pixray_tpu.ops.quant import int8_matmul

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
        g_int8 = jax.grad(lambda x: jnp.sum(int8_matmul(x, w) ** 2) / 100)(x)
        # the cotangent of sum(y^2) differs between paths (y differs), so
        # compare against the straight-through definition itself
        y = int8_matmul(x, w)
        expected = np.asarray(
            jax.lax.dot_general((2 * y / 100).astype(jnp.bfloat16),
                                w.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(g_int8), expected, rtol=1e-6, atol=1e-6)
        assert np.isfinite(np.asarray(g_int8)).all()

    def test_int8_backward_dx_close_to_bf16(self):
        from pixray_tpu.ops.quant import int8_matmul

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        ct = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
        g_bf16 = jax.vjp(lambda x: int8_matmul(x, w, "bf16"), x)[1](ct)[0]
        g_int8 = jax.vjp(lambda x: int8_matmul(x, w, "int8"), x)[1](ct)[0]
        denom = np.abs(np.asarray(g_bf16)).max()
        assert np.abs(np.asarray(g_int8) - np.asarray(g_bf16)).max() / denom < 3e-2

    @pytest.mark.parametrize("mode", ["int8", "int8b"])
    def test_int8_vision_tower_cosine_and_grad(self, mode):
        cfg = tiny_vit_config()
        base = CLIP(cfg, dtype=jnp.float32)
        variables = base.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )
        quant = CLIP(cfg, dtype=jnp.float32, quant=mode)

        rng = np.random.default_rng(2)
        img = jnp.asarray(
            rng.uniform(0, 1, (4, cfg.image_resolution, cfg.image_resolution, 3))
            .astype(np.float32)
        )
        e0 = np.asarray(base.apply(variables, img, method=base.encode_image))
        e1 = np.asarray(quant.apply(variables, img, method=quant.encode_image))
        cos = (e0 * e1).sum(-1) / (
            np.linalg.norm(e0, axis=-1) * np.linalg.norm(e1, axis=-1)
        )
        assert np.all(cos > 0.99)

        g = jax.grad(
            lambda im: jnp.sum(
                quant.apply(variables, im, method=quant.encode_image) ** 2
            )
        )(img)
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)

    @pytest.mark.parametrize("bwd", ["bf16", "int8"])
    def test_prequantized_matches_dynamic(self, bwd):
        """int8_matmul_pre(prequantize_kernel(w)) == int8_matmul(w) bitwise
        (forward), and dx within quantization tolerance for both bwd modes."""
        from pixray_tpu.ops.quant import (
            int8_matmul,
            int8_matmul_pre,
            prequantize_kernel,
        )

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        ct = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
        wq, sw = prequantize_kernel(w)
        assert wq.dtype == jnp.int8 and sw.shape == (1, 32)

        y_dyn, vjp_dyn = jax.vjp(lambda x: int8_matmul(x, w, bwd), x)
        y_pre, vjp_pre = jax.vjp(lambda x: int8_matmul_pre(x, wq, sw, bwd), x)
        np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))
        g_dyn, g_pre = np.asarray(vjp_dyn(ct)[0]), np.asarray(vjp_pre(ct)[0])
        denom = np.abs(g_dyn).max()
        # bf16: identical math up to the sw-fold's rounding; int8: the pre
        # path quantizes g*sw where dynamic quantizes g and W^T separately
        assert np.abs(g_pre - g_dyn).max() / denom < 3e-2

    def test_prequantized_tower_matches_dynamic_tower(self):
        """A vision tower fed the perceptor's pre-quantized 'quant' collection
        encodes bitwise-identically to the dynamic in-step quantize (same f32
        params), and gradients still flow."""
        from pixray_tpu.models.perceptor import build_quant_collection

        cfg = tiny_vit_config()
        quant = CLIP(cfg, dtype=jnp.float32, quant="int8b")
        variables = quant.init(
            jax.random.PRNGKey(3),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )
        quant_col = build_quant_collection(variables["params"])
        assert quant_col, "no QuantDense kernels found in the visual tower"
        with_pre = dict(variables, quant=quant_col)

        rng = np.random.default_rng(4)
        img = jnp.asarray(
            rng.uniform(0, 1, (2, cfg.image_resolution, cfg.image_resolution, 3))
            .astype(np.float32)
        )
        e_dyn = np.asarray(quant.apply(variables, img, method=quant.encode_image))
        e_pre = np.asarray(quant.apply(with_pre, img, method=quant.encode_image))
        np.testing.assert_array_equal(e_dyn, e_pre)

        g = jax.grad(
            lambda im: jnp.sum(
                quant.apply(with_pre, im, method=quant.encode_image) ** 2
            )
        )(img)
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)

    @pytest.mark.parametrize("data_format", ["NHWC", "NCHW"])
    def test_prequantized_patch_affine_matches_dynamic(self, data_format):
        """With the preprocessing affine active, the pre-quantized patch
        kernel folds the scale into the ACTIVATIONS ((x*s)@W == x@(s·W)) —
        embeddings must match the dynamic kernel-side fold to within
        quantization tolerance, in both layouts."""
        from pixray_tpu.models.perceptor import build_quant_collection

        cfg = tiny_vit_config()
        quant = CLIP(cfg, dtype=jnp.float32, quant="int8b")
        variables = quant.init(
            jax.random.PRNGKey(6),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )
        quant_col = build_quant_collection(
            variables["params"], cfg.vision_patch_size
        )
        assert "patch_q" in quant_col["visual"] and "patch_q_cm" in quant_col["visual"]
        with_pre = dict(variables, quant=quant_col)

        rng = np.random.default_rng(7)
        r = cfg.image_resolution
        img = jnp.asarray(rng.uniform(0, 1, (2, r, r, 3)).astype(np.float32))
        if data_format == "NCHW":
            img = img.transpose(0, 3, 1, 2)
        aff = (jnp.asarray([2.0, 1.5, 1.8]), jnp.asarray([-0.4, 0.1, -0.2]))

        e_dyn = np.asarray(quant.apply(
            variables, img, aff, data_format, method=quant.encode_image))
        e_pre = np.asarray(quant.apply(
            with_pre, img, aff, data_format, method=quant.encode_image))
        cos = (e_dyn * e_pre).sum(-1) / (
            np.linalg.norm(e_dyn, axis=-1) * np.linalg.norm(e_pre, axis=-1))
        assert np.all(cos > 0.999)

        g = jax.grad(lambda im: jnp.sum(quant.apply(
            with_pre, im, aff, data_format, method=quant.encode_image) ** 2))(img)
        assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)

    def test_quant_off_is_default_dense(self):
        """quant='none' reproduces the nn.Dense path bitwise (same params)."""
        cfg = tiny_vit_config()
        m = CLIP(cfg, dtype=jnp.bfloat16)
        variables = m.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )
        img = jnp.full((2, cfg.image_resolution, cfg.image_resolution, 3), 0.4)
        a = np.asarray(m.apply(variables, img, method=m.encode_image))
        b = np.asarray(m.apply(variables, img, method=m.encode_image))
        np.testing.assert_array_equal(a, b)


class TestTokenizer:
    def test_fallback_roundtrip(self):
        from pixray_tpu.models.clip.tokenizer import SimpleTokenizer

        tok = SimpleTokenizer(bpe_path=None) if True else None
        ids = tok.encode("hello world")
        assert len(ids) > 0
        assert "hello world" in tok.decode(ids)

    def test_tokenize_shape_and_specials(self):
        from pixray_tpu.models.clip.tokenizer import get_tokenizer, tokenize

        arr = tokenize(["a cat", "a dog"], context_length=77)
        assert arr.shape == (2, 77)
        tok = get_tokenizer()
        assert arr[0, 0] == tok.sot_token
        assert tok.eot_token in arr[0]

    def test_truncation(self):
        from pixray_tpu.models.clip.tokenizer import get_tokenizer, tokenize

        arr = tokenize("word " * 200, context_length=16)
        assert arr.shape == (1, 16)
        assert arr[0, -1] == get_tokenizer().eot_token


def tiny_timm_config():
    return CLIPConfig(
        name="tiny-slip", embed_dim=48, image_resolution=32, vision_kind="vit",
        vision_width=64, vision_layers=2, vision_patch_size=8, vision_heads=2,
        context_length=16, vocab_size=64, text_width=32, text_heads=2, text_layers=2,
        vision_style="timm",
    )


def test_slip_converter_matches_init_tree():
    """convert_slip_clip must produce exactly the tree a timm-style model builds."""
    from pixray_tpu.models.clip.convert import convert_slip_clip

    cfg = tiny_timm_config()
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

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

    variables = convert_slip_clip(sd, cfg)
    model = CLIP(cfg, dtype=jnp.float32)
    ref = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.zeros((1, cfg.context_length), dtype=jnp.int32),
    )
    ref_flat = {str(k): x.shape for k, x in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {str(k): x.shape for k, x in jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_flat == got_flat

    out = model.apply(variables, jnp.ones((1, 32, 32, 3)) * 0.4, method=model.encode_image)
    assert out.shape == (1, cfg.embed_dim)
    assert jnp.all(jnp.isfinite(out))
