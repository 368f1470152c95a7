"""Flax VGG16 feature extractor for the STROTSS style loss.

Replaces torchvision's ``vgg16().features`` used by the reference
(/root/reference/Losses/StyleLoss.py:24-47).  Capture points are the ReLU outputs
at torchvision indices [1,3,6,8,11,13,15,22,29], plus the input itself, giving the
3+2·64+2·128+3·256+2·512-channel hypercolumn of STROTSS.

Weights are converted from a torchvision ``vgg16`` state dict when found under
models/ (vgg16.pth / vgg16_features.pth); otherwise randomly initialized with a
warning.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, pool_before) per conv in torchvision order
_VGG16_CONVS = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# conv index → capture its ReLU output? torchvision feature indices
# [1,3,6,8,11,13,15,22,29] correspond to convs 0,1,2,3,4,5,6,9,12
CAPTURE_CONVS = {0, 1, 2, 3, 4, 5, 6, 9, 12}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_vgg16_params(key):
    params = {}
    in_ch = 3
    for i, (out_ch, _pool) in enumerate(_VGG16_CONVS):
        k1, k2, key = jax.random.split(key, 3)
        scale = np.sqrt(2.0 / (3 * 3 * in_ch))
        params[f"conv{i}"] = {
            "kernel": jax.random.normal(k1, (3, 3, in_ch, out_ch)) * scale,
            "bias": jnp.zeros((out_ch,)),
        }
        in_ch = out_ch
    return params


def convert_torchvision_vgg16(state_dict):
    """torchvision vgg16 state dict (features.N.weight/bias) → our params."""
    params = {}
    conv_idx = 0
    feature_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for fi in feature_indices:
        w = np.asarray(state_dict[f"features.{fi}.weight"], np.float32)
        b = np.asarray(state_dict[f"features.{fi}.bias"], np.float32)
        params[f"conv{conv_idx}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
        conv_idx += 1
    return params


def load_vgg16_params():
    for name in ("vgg16.pth", "vgg16_features.pth", "vgg16-397923af.pth"):
        path = os.path.join(os.environ.get("PIXRAY_TPU_MODELS", "models"), name)
        if os.path.exists(path):
            import torch

            sd = torch.load(path, map_location="cpu")
            sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
            print(f"Loaded VGG16 weights from {path}")
            return convert_torchvision_vgg16(sd)
    print("WARNING: VGG16 weights not found under models/ — using random init")
    return init_vgg16_params(jax.random.PRNGKey(16))


def vgg16_features(params, x, space="uniform"):
    """x: (B, H, W, 3).  Returns the list of captured feature maps (NHWC),
    feat[0] = normalized input (matching StyleLoss.py:41-47)."""
    if space != "vgg":
        x = (x + 1.0) / 2.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    feats = [x]
    h = x
    for i, (_out_ch, pool) in enumerate(_VGG16_CONVS):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        p = params[f"conv{i}"]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        h = jax.nn.relu(h)
        if i in CAPTURE_CONVS:
            feats.append(h)
    return feats
