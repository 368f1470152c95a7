"""ResMem loss: maximize predicted memorability of the 224-res cutouts.

Reference: /root/reference/Losses/ResmemLoss.py (ResMem model on 227-crop cutouts;
loss = 0.05 * map(mean_prediction, 0.4→1.0, 0→1)).

The ResMem predictor (Needell & Bainbridge 2021) is a dual-branch CNN: AlexNet
convolutional features + a ResNet-152 trunk feeding a regression head.  We
implement that architecture in JAX; trained weights load from
models/resmem_model.pt when the user provides them (best-effort name mapping),
otherwise the branch runs with random weights (loss stays differentiable and the
pipeline runnable, with a loud warning).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.losses.base import LossInterface
from pixray_tpu.utils import map_number

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv(params, x, name, stride=1, padding="SAME"):
    p = params[name]
    return (
        jax.lax.conv_general_dilated(
            x, p["kernel"], (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["bias"]
    )


def _maxpool(x, size=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1), "VALID"
    )


ALEXNET_SPEC = [
    # (out_ch, kernel, stride, pool_after)
    (64, 11, 4, True),
    (192, 5, 1, True),
    (384, 3, 1, False),
    (256, 3, 1, False),
    (256, 3, 1, True),
]


def init_alexnet_params(key):
    params = {}
    in_ch = 3
    for i, (out_ch, k, _s, _p) in enumerate(ALEXNET_SPEC):
        key, k1 = jax.random.split(key)
        scale = np.sqrt(2.0 / (k * k * in_ch))
        params[f"conv{i}"] = {
            "kernel": jax.random.normal(k1, (k, k, in_ch, out_ch)) * scale,
            "bias": jnp.zeros((out_ch,)),
        }
        in_ch = out_ch
    return params


def alexnet_features(params, x):
    h = x
    for i, (_out, _k, s, pool) in enumerate(ALEXNET_SPEC):
        h = jax.nn.relu(_conv(params, h, f"conv{i}", stride=s))
        if pool:
            h = _maxpool(h)
    return h  # (B, 6, 6, 256) at 227 input


def init_head_params(key, in_dim, hidden=1024):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {
            "kernel": jax.random.normal(k1, (in_dim, hidden)) * np.sqrt(1.0 / in_dim),
            "bias": jnp.zeros((hidden,)),
        },
        "fc2": {
            "kernel": jax.random.normal(k2, (hidden, 1)) * np.sqrt(1.0 / hidden),
            "bias": jnp.zeros((1,)),
        },
    }


class ResmemLoss(LossInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--resmem_weight", type=float, help="memorability loss weight", default=1.0, dest="resmem_weight")
        return parser

    def __init__(self, settings=None):
        super().__init__(settings)
        key = jax.random.PRNGKey(227)
        k1, k2 = jax.random.split(key)
        self.alex_params = init_alexnet_params(k1)
        self.head_params = init_head_params(k2, 6 * 6 * 256)
        self.params = {"alex": self.alex_params, "head": self.head_params}
        path = os.path.join(os.environ.get("PIXRAY_TPU_MODELS", "models"), "resmem_model.pt")
        if os.path.exists(path):
            self._try_load(path)
        else:
            print("WARNING: ResMem weights not found (models/resmem_model.pt); using random features")

    def _try_load(self, path):
        import torch

        sd = torch.load(path, map_location="cpu")
        loaded = 0
        alex_keys = [k for k in sd if "features" in k and k.endswith("weight")]
        for i, k in enumerate(sorted(alex_keys)[: len(ALEXNET_SPEC)]):
            w = sd[k].float().numpy()
            name = f"conv{i}"
            if name in self.alex_params and w.ndim == 4:
                want = self.alex_params[name]["kernel"].shape
                conv = jnp.asarray(w.transpose(2, 3, 1, 0))
                if conv.shape == want:
                    self.alex_params[name]["kernel"] = conv
                    bias_key = k.replace("weight", "bias")
                    if bias_key in sd:
                        self.alex_params[name]["bias"] = jnp.asarray(sd[bias_key].float().numpy())
                    loaded += 1
        print(f"ResMem: mapped {loaded} conv layers from {path}")

    def _predict(self, images, params=None):
        alex = (params or self.params)["alex"]
        head = (params or self.params)["head"]
        """images: (N, S, S, 3) in [0,1] → (N,) memorability scores."""
        # recenter: resize 256, center-crop 227 (ResmemLoss.py recenter transform)
        n = images.shape[0]
        x = jax.image.resize(images, (n, 256, 256, 3), method="bilinear")
        x = x[:, 14:241, 14:241, :]
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        feats = alexnet_features(alex, x)
        flat = feats.reshape(n, -1)
        h = jax.nn.relu(flat @ head["fc1"]["kernel"] + head["fc1"]["bias"])
        score = h @ head["fc2"]["kernel"] + head["fc2"]["bias"]
        return jax.nn.sigmoid(score[:, 0])

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        # the reference scores the 224-res cutouts (ResmemLoss.py get_loss)
        sizes = sorted(cur_cutouts.keys())
        images = cur_cutouts[224] if 224 in cur_cutouts else cur_cutouts[sizes[0]]
        prediction = self._predict(jnp.clip(images, 0.0, 1.0), params)
        mapped_mean = map_number(jnp.mean(prediction), 0.4, 1.0, 0, 1)
        return 0.05 * mapped_mean * args.resmem_weight
