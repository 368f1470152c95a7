"""Op-level golden tests: adaptive pooling vs torch, warps, color jitter, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixray_tpu.ops.pool import adaptive_avg_pool, adaptive_max_pool

KEY = jax.random.PRNGKey(0)


class TestAdaptivePooling:
    @pytest.mark.parametrize("in_hw,out_hw", [((216, 384), (224, 224)), ((300, 300), (64, 64)), ((50, 70), (224, 224))])
    def test_matches_torch(self, in_hw, out_hw):
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(0)
        img = rng.random((1, *in_hw, 3)).astype(np.float32)
        t = torch.from_numpy(img.transpose(0, 3, 1, 2))

        ours_avg = np.asarray(adaptive_avg_pool(jnp.asarray(img), *out_hw))
        theirs_avg = torch.nn.functional.adaptive_avg_pool2d(t, out_hw).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours_avg, theirs_avg, atol=2e-5)

        ours_max = np.asarray(adaptive_max_pool(jnp.asarray(img), *out_hw))
        theirs_max = torch.nn.functional.adaptive_max_pool2d(t, out_hw).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours_max, theirs_max, atol=1e-6)

    def test_avg_pool_gradient(self):
        img = jnp.ones((20, 30, 3)) * 0.5
        g = jax.grad(lambda x: jnp.sum(adaptive_avg_pool(x, 8, 8) ** 2))(img)
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)


class TestGradTricks:
    def test_clamp_with_grad_inside(self):
        from pixray_tpu.ops.grad import clamp_with_grad

        g = jax.grad(lambda x: jnp.sum(clamp_with_grad(x, 0.0, 1.0)))(jnp.asarray([0.5, 0.2]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])

    def test_clamp_with_grad_outside_blocks_outward(self):
        from pixray_tpu.ops.grad import clamp_with_grad

        # loss = -sum(clamp(x)): gradient wants to increase x; at x=1.5 (above the
        # clamp) increasing is pushing further out → blocked
        g = jax.grad(lambda x: -jnp.sum(clamp_with_grad(x, 0.0, 1.0)))(jnp.asarray([1.5]))
        assert float(g[0]) == 0.0
        # gradient pushing back IN is allowed
        g2 = jax.grad(lambda x: jnp.sum(clamp_with_grad(x, 0.0, 1.0)))(jnp.asarray([1.5]))
        assert float(g2[0]) == 1.0

    def test_replace_grad(self):
        from pixray_tpu.ops.grad import replace_grad

        def f(a, b):
            return jnp.sum(replace_grad(a, b) * 2.0)

        ga = jax.grad(f, argnums=0)(jnp.ones(3), jnp.ones(3))
        gb = jax.grad(f, argnums=1)(jnp.ones(3), jnp.ones(3))
        assert jnp.all(ga == 0)
        assert jnp.all(gb == 2.0)

    def test_spherical_dist_matches_torch_formula(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from pixray_tpu.ops.grad import spherical_dist_loss

        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 16)).astype(np.float32)
        y = rng.standard_normal((4, 16)).astype(np.float32)
        ours = np.asarray(spherical_dist_loss(jnp.asarray(x), jnp.asarray(y)))
        tx, ty = F.normalize(torch.from_numpy(x), dim=-1), F.normalize(torch.from_numpy(y), dim=-1)
        theirs = (tx - ty).norm(dim=-1).div(2).arcsin().pow(2).mul(2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestColor:
    def test_hsv_roundtrip(self):
        from pixray_tpu.ops.color import hsv_to_rgb, rgb_to_hsv

        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.random((32, 3)), jnp.float32)
        back = hsv_to_rgb(rgb_to_hsv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_jitter_identity_at_zero(self):
        from pixray_tpu.ops.color import adjust_hue_saturation

        rgb = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)), jnp.float32)
        out = adjust_hue_saturation(rgb, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


class TestCutoutPipeline:
    def test_shapes_and_gradient(self):
        from pixray_tpu.engine.cutouts import make_cutouts

        img = jnp.asarray(np.random.default_rng(0).random((54, 96, 3)), jnp.float32)

        def f(im):
            # 4 cuts still covers both branches (split_counts(4) = 2 zoom + 2
            # wide); jit + the small bank keeps this in the fast-tier budget
            batch, _ = make_cutouts(
                KEY, im, 32, 4, 96 / 54, reflect_padding=True, fill_color=jnp.float32(0.5)
            )
            return jnp.sum(batch**2)

        loss, g = jax.jit(jax.value_and_grad(f))(img)
        assert jnp.isfinite(loss)
        assert jnp.any(g != 0)

    def test_transform_sharing_deterministic(self):
        from pixray_tpu.engine.cutouts import (
            pool_to_work,
            render_cutouts,
            sample_cut_transforms,
        )

        img = jnp.asarray(np.random.default_rng(0).random((54, 96, 3)), jnp.float32)
        work = pool_to_work(img, 32, 96 / 54)
        t = sample_cut_transforms(KEY, 32, 8, 96 / 54)
        k_noise = jax.random.PRNGKey(7)
        b1 = render_cutouts(work, t, 32, reflect_padding=True, fill_color=jnp.float32(0.3), noise_key=k_noise)
        b2 = render_cutouts(work, t, 32, reflect_padding=True, fill_color=jnp.float32(0.3), noise_key=k_noise)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    def test_separable_matches_generic_warp(self):
        """warp_batch_separable must match the generic mixed-mode XLA path in
        value AND gradient on axis-aligned matrices (all 3 padding modes +
        fill compositing) — the contract the fixed-count perspective split
        relies on."""
        from pixray_tpu.ops.warp import crop_box_transform
        from pixray_tpu.ops.warp_batch import (
            warp_batch_modes as generic,
        )
        from pixray_tpu.ops.warp_batch import warp_batch_separable

        rng = np.random.default_rng(3)
        work = jnp.asarray(rng.random((40, 40, 3)), jnp.float32)
        boxes = [
            (2.0, 3.0, 30.0, 28.0),   # interior crop (refl mode)
            (0.0, 0.0, 40.0, 40.0),   # full canvas (border mode)
            (-6.0, -8.0, 52.0, 56.0), # superset -> zeros+fill composite
            (5.5, 1.25, 12.5, 33.0),  # fractional offsets (refl)
        ]
        ms = jnp.stack([crop_box_transform(*b, 24, 24) for b in boxes])
        modes = jnp.asarray([0, 1, 2, 0], jnp.int32)
        fill_mask = jnp.asarray([False, False, True, False])

        def f_sep(w):
            return warp_batch_separable(w, ms, modes, 24, fill_value=0.37,
                                        fill_mask=fill_mask)

        def f_gen(w):
            return generic(w, ms, modes, 24, fill_value=0.37, fill_mask=fill_mask)

        np.testing.assert_allclose(np.asarray(f_sep(work)), np.asarray(f_gen(work)),
                                   atol=1e-5)
        g_sep = jax.grad(lambda w: jnp.sum(f_sep(w) ** 2))(work)
        g_gen = jax.grad(lambda w: jnp.sum(f_gen(w) ** 2))(work)
        np.testing.assert_allclose(np.asarray(g_sep), np.asarray(g_gen),
                                   rtol=1e-4, atol=1e-4)

    def test_persp_split_order_contract(self):
        """Under the fixed-count split the first persp_split(n) slots of each
        branch carry perspective and the rest are EXACTLY axis-aligned."""
        from pixray_tpu.engine.cutouts import (
            persp_split,
            sample_cut_transforms,
            split_counts,
        )

        zoom_ms, wide_ms = sample_cut_transforms(KEY, 32, 16, 96 / 54)
        nz, nw = split_counts(16)
        for ms, n in ((np.asarray(zoom_ms), nz), (np.asarray(wide_ms), nw)):
            n_p, n_s = persp_split(n)
            assert n_p + n_s == n and n_s > 0
            off_axis = np.stack([ms[:, 0, 1], ms[:, 1, 0], ms[:, 2, 0], ms[:, 2, 1]], -1)
            assert np.all(off_axis[n_p:] == 0.0)  # separable slots
            assert np.all(np.any(off_axis[:n_p] != 0.0, axis=-1))  # perspective slots

    def test_square_work_matches_widened_geometry(self, monkeypatch):
        """The square-work default samples the SAME cutout geometry as the
        reference-shaped widened canvas (aspect fold into the matrices): banks
        agree to bilinear-refiltering tolerance, with the identical PRNG
        schedule (same transforms, same noise draws)."""
        from pixray_tpu.engine import cutouts as C

        img = jnp.asarray(np.random.default_rng(0).random((108, 192, 3)), jnp.float32)
        k_t, k_noise = jax.random.split(jax.random.PRNGKey(3))

        def bank(square):
            monkeypatch.setenv("PIXRAY_TPU_SQUARE_WORK", "1" if square else "0")
            work = C.pool_to_work(img, 64, 192 / 108)
            t = C.sample_cut_transforms(k_t, 64, 8, 192 / 108)
            b = C.render_cutouts(
                work, t, 64, reflect_padding=jnp.asarray(True),
                fill_color=jnp.float32(0.4), noise_key=k_noise,
            )
            return np.asarray(b)

        sq, wd = bank(True), bank(False)
        d = np.abs(sq - wd)
        assert d.mean() < 0.01, d.mean()
        assert np.percentile(d, 99) < 0.08, np.percentile(d, 99)


class TestSpotMasks:
    def test_default_mask_orientation(self):
        """spot=on must keep the CENTER (foreground) visible: the procedural mask
        is white=background ring, and keep_on = 1-white (reference zeroes the
        >=0.5 region for spot prompts, pixray.py:453-466)."""
        from pixray_tpu.io.images import default_spot_mask, load_spot_mask

        mask = default_spot_mask(64, 1.0)
        h = 64 // 2
        assert mask[h, h] == 0.0  # center is NOT background
        assert mask[1, 1] == 1.0  # corner IS background

        keep_on = 1.0 - (load_spot_mask(None, 64, 1.0) >= 0.5)
        assert keep_on[h, h] == 1.0  # spot cutouts keep the center
        assert keep_on[1, 1] == 0.0  # ...and zero the ring


def test_color_jitter_gradients_finite_on_gray():
    """Gray/constant pixels must yield FINITE gradients through the jitter.

    Regression for the round-2 NaN hunt (BUGS.md): `where(cond, x/d, 0)` still
    differentiates the untaken branch, whose 1/d² cotangents blow up at d=0 —
    guaranteed on bf16-quantized cutouts and constant gray fills."""
    import jax
    import jax.numpy as jnp
    from pixray_tpu.ops.color import random_color_jitter

    # worst case: exactly-gray image (delta == 0 everywhere) in bf16
    for dtype in (jnp.float32, jnp.bfloat16):
        img = jnp.full((16, 16, 3), 0.5, dtype)

        def loss(im):
            out = random_color_jitter(jax.random.PRNGKey(3), im, hue=0.1,
                                      saturation=0.1, p=1.0)
            return jnp.sum((out.astype(jnp.float32)) ** 2)

        g = jax.grad(loss)(img)
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all()), dtype
