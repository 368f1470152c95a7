"""The preprocess affine fold must match the materialized preprocess exactly.

``Perceptor.preprocess`` (range-stretch slip.py:21-42 + per-channel
standardize slip.py:173-186) is jointly a per-channel affine of the input
batch; ``preprocess_affine`` defers it and the ViT folds it into the
patch-embedding matmul (models/clip/model.py).  These tests pin value AND
gradient parity of the folded path against the materialized one, for the
ViT fold and the ResNet materialize fallback.
"""

import jax
import jax.numpy as jnp
import pytest

from pixray_tpu.models.clip.configs import CLIPConfig
from pixray_tpu.models.clip.model import CLIP
from pixray_tpu.models.perceptor import Perceptor
from pixray_tpu.ops.grad import l2_normalize


@pytest.fixture(scope="module")
def tiny():
    return Perceptor("TinyTest", dtype=jnp.float32)


def _materialized(p, variables, imgs):
    e = p.model.apply(variables, p.preprocess(imgs), method=p.model.encode_image)
    return l2_normalize(e.astype(jnp.float32), axis=-1)


def test_vit_fold_value_parity(tiny):
    p = tiny
    imgs = jax.random.uniform(
        jax.random.PRNGKey(0),
        (4, p.input_resolution, p.input_resolution, 3),
        minval=-0.05, maxval=1.1,  # exercise the range-stretch (not already [0,1])
    )
    old = _materialized(p, p.variables, imgs)
    new = p.image_fn(p.variables, imgs)
    assert float(jnp.abs(old - new).max()) < 1e-5


def test_vit_fold_gradient_parity(tiny):
    p = tiny
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1),
        (2, p.input_resolution, p.input_resolution, 3),
    )
    g_old = jax.grad(lambda x: _materialized(p, p.variables, x).sum())(imgs)
    g_new = jax.grad(lambda x: p.image_fn(p.variables, x).sum())(imgs)
    scale = float(jnp.abs(g_old).max())
    assert float(jnp.abs(g_old - g_new).max()) < 1e-4 * max(scale, 1.0)


def test_vit_fold_with_resize(tiny):
    # cut_size != input_resolution exercises the resize-then-affine ordering
    p = tiny
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 48, 48, 3))
    old = _materialized(p, p.variables, imgs)
    new = p.image_fn(p.variables, imgs)
    assert float(jnp.abs(old - new).max()) < 1e-5


def test_resnet_materialize_fallback():
    # tiny ModifiedResNet: encode_image(in_affine=...) materializes the affine
    cfg = CLIPConfig(
        name="TinyRN", embed_dim=32, image_resolution=32, vision_kind="resnet",
        vision_width=8, vision_layers=(1, 1, 1, 1), vision_patch_size=None,
        vision_heads=4, context_length=77, vocab_size=49408,
        text_width=64, text_heads=2, text_layers=2,
    )
    model = CLIP(cfg, dtype=jnp.float32)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    variables = model.init(
        jax.random.PRNGKey(4), imgs, jnp.zeros((1, 77), dtype=jnp.int32)
    )
    scale = jnp.asarray([2.0, 3.0, 4.0])
    shift = jnp.asarray([-0.5, 0.0, 0.25])
    direct = model.apply(
        variables, imgs * scale + shift, method=model.encode_image
    )
    folded = model.apply(
        variables, imgs, (scale, shift), method=model.encode_image
    )
    assert float(jnp.abs(direct - folded).max()) < 1e-5
