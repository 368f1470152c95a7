"""VQGAN / v-diffusion / super-resolution drawer tests (tiny configs, CPU)."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def test_vqgan_zoo_matches_reference():
    """Zoo covers the reference's full 12-checkpoint table (vqgan.py:33-46)."""
    from pixray_tpu.drawers.vqgan import VQGAN_CHECKPOINT_URLS
    from pixray_tpu.models.vqgan import VQGAN_CONFIGS

    expected = {
        "imagenet_f16_1024", "imagenet_f16_16384", "imagenet_f16_16384m",
        "openimages_f16_8192", "coco", "faceshq",
        "wikiart_1024", "wikiart_1024m", "wikiart_16384", "wikiart_16384m",
        "wikiart_16384m2", "sflckr",
    }
    assert set(VQGAN_CHECKPOINT_URLS) == expected
    # every downloadable checkpoint has an architecture config
    assert expected <= set(VQGAN_CONFIGS)


class TestVQGANModel:
    @pytest.fixture(scope="class")
    def tiny(self):
        from pixray_tpu.models.vqgan import VQGAN, VQGANConfig

        cfg = VQGANConfig(
            ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
            resolution=16, z_channels=32, embed_dim=32, n_embed=32,
        )
        m = VQGAN(cfg)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        return m, v, cfg

    def test_encode_decode_shapes(self, tiny):
        m, v, cfg = tiny
        x = jnp.ones((1, 16, 16, 3)) * 0.2
        z = m.apply(v, x, method=m.encode)
        assert z.shape == (1, 8, 8, 32)
        y = m.apply(v, z, method=m.decode_from_continuous)
        assert y.shape == (1, 16, 16, 3)

    def test_quantize_snaps_to_codebook(self, tiny):
        m, v, cfg = tiny
        z = jnp.ones((1, 2, 2, 32)) * 0.1
        zq = m.apply(v, z, method=m.quantize)
        codebook = np.asarray(v["params"]["codebook"])
        flat = np.asarray(zq).reshape(-1, 32)
        for row in flat:
            dists = np.linalg.norm(codebook - row, axis=1)
            assert dists.min() < 1e-5  # every quantized vector IS a codebook row

    def test_straight_through_gradient(self, tiny):
        m, v, cfg = tiny

        def f(z):
            return jnp.sum(m.apply(v, z, method=m.decode_from_continuous) ** 2)

        g = jax.grad(f)(jnp.ones((1, 8, 8, 32)) * 0.05)
        assert jnp.any(g != 0)

    def test_converter_matches_init_tree(self, tiny):
        from pixray_tpu.models.vqgan import convert_taming_vqgan

        m, v, cfg = tiny
        # synthesize a taming-style state dict with the right shapes
        rng = np.random.default_rng(0)
        sd = {}

        def add_conv(name, out_c, in_c, k):
            sd[f"{name}.weight"] = rng.standard_normal((out_c, in_c, k, k)).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal((out_c,)).astype(np.float32)

        def add_gn(name, c):
            sd[f"{name}.weight"] = np.ones((c,), np.float32)
            sd[f"{name}.bias"] = np.zeros((c,), np.float32)

        def add_res(prefix, in_c, out_c):
            add_gn(f"{prefix}.norm1", in_c)
            add_conv(f"{prefix}.conv1", out_c, in_c, 3)
            add_gn(f"{prefix}.norm2", out_c)
            add_conv(f"{prefix}.conv2", out_c, out_c, 3)
            if in_c != out_c:
                add_conv(f"{prefix}.nin_shortcut", out_c, in_c, 1)

        def add_attn(prefix, c):
            add_gn(f"{prefix}.norm", c)
            for n in ("q", "k", "v", "proj_out"):
                add_conv(f"{prefix}.{n}", c, c, 1)

        ch = cfg.ch
        add_conv("encoder.conv_in", ch, 3, 3)
        # stage 0 (res 16, no attn), stage 1 (res 8, attn)
        add_res("encoder.down.0.block.0", ch, ch)
        add_conv("encoder.down.0.downsample.conv", ch, ch, 3)
        add_res("encoder.down.1.block.0", ch, ch * 2)
        add_attn("encoder.down.1.attn.0", ch * 2)
        add_res("encoder.mid.block_1", ch * 2, ch * 2)
        add_attn("encoder.mid.attn_1", ch * 2)
        add_res("encoder.mid.block_2", ch * 2, ch * 2)
        add_gn("encoder.norm_out", ch * 2)
        add_conv("encoder.conv_out", cfg.z_channels, ch * 2, 3)

        add_conv("decoder.conv_in", ch * 2, cfg.z_channels, 3)
        add_res("decoder.mid.block_1", ch * 2, ch * 2)
        add_attn("decoder.mid.attn_1", ch * 2)
        add_res("decoder.mid.block_2", ch * 2, ch * 2)
        add_res("decoder.up.1.block.0", ch * 2, ch * 2)
        add_res("decoder.up.1.block.1", ch * 2, ch * 2)
        add_attn("decoder.up.1.attn.0", ch * 2)
        add_attn("decoder.up.1.attn.1", ch * 2)
        add_conv("decoder.up.1.upsample.conv", ch * 2, ch * 2, 3)
        add_res("decoder.up.0.block.0", ch * 2, ch)
        add_res("decoder.up.0.block.1", ch, ch)
        add_gn("decoder.norm_out", ch)
        add_conv("decoder.conv_out", 3, ch, 3)

        add_conv("quant_conv", cfg.embed_dim, cfg.z_channels, 1)
        add_conv("post_quant_conv", cfg.z_channels, cfg.embed_dim, 1)
        sd["quantize.embedding.weight"] = rng.standard_normal((cfg.n_embed, cfg.embed_dim)).astype(np.float32)

        converted = convert_taming_vqgan(sd, cfg)
        ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, v)
        got_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
        ref_flat = {str(k): s for k, s in jax.tree_util.tree_flatten_with_path(ref_shapes)[0]}
        got_flat = {str(k): s for k, s in jax.tree_util.tree_flatten_with_path(got_shapes)[0]}
        assert ref_flat == got_flat


class TestVdiff:
    def test_schedule_shapes(self):
        from pixray_tpu.models.vdiff import (
            get_log_schedule,
            get_spliced_ddpm_cosine_schedule,
            t_to_alpha_sigma,
        )

        t = jnp.linspace(1.0, 0.0, 12)[:-1]
        for sched in (get_spliced_ddpm_cosine_schedule(t), get_log_schedule(t)):
            a, s = t_to_alpha_sigma(sched)
            assert jnp.all(a >= -1e-6) and jnp.all(s >= -1e-6)
            np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, atol=1e-5)

    def test_sampler_step_and_noise(self):
        from pixray_tpu.models.vdiff import sample_noise, sample_setup, sample_step

        def model_fn(x, t, extra):
            return 0.1 * x

        steps = jnp.linspace(0.9, 0.0, 8)
        state = sample_setup(model_fn, steps, eta=1.0)
        x = jax.random.normal(KEY, (1, 8, 8, 3))
        pred, v = sample_step(state, x, 0)
        assert pred.shape == x.shape
        x_next = sample_noise(state, x, 0, pred, v, KEY)
        assert jnp.all(jnp.isfinite(x_next))

    def test_drawer_end_to_end(self):
        from pixray_tpu.drawers.vdiff import VdiffDrawer

        settings = SimpleNamespace(
            size=[64, 36], vdiff_model="tiny_test", vdiff_schedule="default",
            vdiff_skip=0, iterations=6, clip_models=["TinyTest"], transparent=False,
        )
        d = VdiffDrawer(settings)
        d.load_model(settings)
        d.snap_canvas(settings.size)
        z = d.init_params(KEY)
        assert z.shape == (1, 128, 128, 3)  # rounded up to 128
        img = d.synth(d.model_params, z, 0)
        assert img.shape == (36, 64, 3)

        g = jax.grad(lambda z: jnp.sum(d.synth(d.model_params, z, 0)))(z)
        assert jnp.any(g != 0)

        new_z = d.post_step(z, 1)
        assert new_z is not None and new_z.shape == z.shape
        assert 0 < d.learning_rate <= 0.01


class TestEsrgan:
    def test_rrdbnet_tiny_shapes_and_grad(self):
        from pixray_tpu.models.esrgan import RRDBNet

        m = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
        v = m.init(KEY, jnp.zeros((1, 8, 8, 3)))
        y = m.apply(v, jnp.ones((1, 8, 8, 3)) * 0.5)
        assert y.shape == (1, 32, 32, 3)

        g = jax.grad(lambda x: jnp.sum(m.apply(v, x) ** 2))(jnp.ones((1, 8, 8, 3)) * 0.5)
        assert jnp.any(g != 0)

    def test_converter_tree(self):
        from pixray_tpu.models.esrgan import RRDBNet, convert_rrdbnet

        m = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
        ref = m.init(KEY, jnp.zeros((1, 8, 8, 3)))

        rng = np.random.default_rng(0)
        sd = {}

        def add(name, out_c, in_c):
            sd[f"{name}.weight"] = rng.standard_normal((out_c, in_c, 3, 3)).astype(np.float32)
            sd[f"{name}.bias"] = np.zeros((out_c,), np.float32)

        add("conv_first", 16, 3)
        for i in range(2):
            for r in (1, 2, 3):
                ins = [16, 24, 32, 40, 48]
                for c in range(1, 5):
                    add(f"body.{i}.rdb{r}.conv{c}", 8, ins[c - 1])
                add(f"body.{i}.rdb{r}.conv5", 16, 48)
        for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
            add(name, 16, 16)
        add("conv_last", 3, 16)

        converted = convert_rrdbnet(sd, num_block=2)
        ref_flat = {str(k): x.shape for k, x in jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_flat = {str(k): x.shape for k, x in jax.tree_util.tree_flatten_with_path(converted)[0]}
        assert ref_flat == got_flat

    def test_tiled_matches_whole(self):
        from pixray_tpu.models.esrgan import RRDBNet, enhance_tiled

        m = RRDBNet(num_feat=16, num_block=1, num_grow_ch=8, scale=4)
        v = m.init(KEY, jnp.zeros((1, 8, 8, 3)))
        img = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32)
        whole = m.apply(v, img)
        # a tile covering the whole image must be exactly the whole-image result
        full_tile = enhance_tiled(m, v, img, tile=16, tile_pad=4)
        assert np.abs(np.asarray(whole) - np.asarray(full_tile)).max() < 1e-5
        # overlap-tiled path: correct shape, finite, and close in the interior
        # (exact equality needs tile_pad >= receptive field)
        tiled = enhance_tiled(m, v, img, tile=8, tile_pad=6)
        assert tiled.shape == whole.shape
        assert np.isfinite(np.asarray(tiled)).all()
        interior = (slice(None), slice(16, 48), slice(16, 48), slice(None))
        assert np.abs(np.asarray(whole)[interior] - np.asarray(tiled)[interior]).mean() < 0.05


class TestSuperResolutionDrawer:
    def test_synth_and_grad(self):
        from pixray_tpu.drawers.super_resolution import SuperResolutionDrawer
        import pixray_tpu.drawers.super_resolution as sr

        settings = SimpleNamespace(size=[32, 32], super_resolution_model="RealESRGAN_x4plus", transparent=False)
        d = SuperResolutionDrawer(settings)
        # patch in a tiny net to keep the test fast
        from pixray_tpu.models.esrgan import RRDBNet

        d.model = RRDBNet(num_feat=16, num_block=1, num_grow_ch=8, scale=4)
        d.model_params = d.model.init(KEY, jnp.zeros((1, 8, 8, 3)))
        d.snap_canvas(settings.size)
        z = d.init_params(KEY)
        assert z.shape == (8, 8, 3)
        img = d.synth(d.model_params, z, 0)
        assert img.shape == (32, 32, 3)
        g = jax.grad(lambda z: jnp.sum(d.synth(d.model_params, z, 0)))(z)
        assert jnp.any(g != 0)
