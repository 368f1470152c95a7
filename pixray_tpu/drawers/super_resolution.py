"""Super-resolution drawer: optimize a quarter-res latent "through" Real-ESRGAN.

Parity with /root/reference/super_resolution.py: latent = (H/4, W/4, 3) image in
[0,1]; synth = RRDBNet 4x upscale with gradients flowing through the network;
clamp-with-grad output; global model cache; weights from
models/super_resolution_RealESRGAN_x4plus.ckpt when present.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from pixray_tpu.drawers.base import DrawingInterface
from pixray_tpu.models.esrgan import RRDBNet, convert_rrdbnet
from pixray_tpu.ops.grad import clamp_with_grad

SUPERRESOLUTION_CHECKPOINT_TABLE = {
    "RealESRGAN_x4plus": "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.1.0/RealESRGAN_x4plus.pth",
}

_global_model_cache: dict = {}


class SuperResolutionDrawer(DrawingInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--super_resolution_model", type=str, help="Super resolution model", default="RealESRGAN_x4plus", dest="super_resolution_model")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.super_resolution_model = settings.super_resolution_model

    def load_model(self, settings):
        checkpoint_path = f"models/super_resolution_{self.super_resolution_model}.ckpt"
        if checkpoint_path in _global_model_cache:
            entry = _global_model_cache[checkpoint_path]
        else:
            model = RRDBNet(num_feat=64, num_block=23, num_grow_ch=32, scale=4)
            if not os.path.exists(checkpoint_path):
                from pixray_tpu.utils.download import wget_file

                wget_file(SUPERRESOLUTION_CHECKPOINT_TABLE[self.super_resolution_model], checkpoint_path)
            if os.path.exists(checkpoint_path):
                import torch

                sd = torch.load(checkpoint_path, map_location="cpu")
                if isinstance(sd, dict) and "params_ema" in sd:
                    sd = sd["params_ema"]
                elif isinstance(sd, dict) and "params" in sd:
                    sd = sd["params"]
                sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
                variables = convert_rrdbnet(sd)
                print(f"Loaded RealESRGAN from {checkpoint_path}")
            else:
                print(
                    f"WARNING: {checkpoint_path} not found — random RRDBNet weights "
                    "(place RealESRGAN_x4plus.pth there)"
                )
                variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
            entry = {"model": model, "variables": variables}
            _global_model_cache[checkpoint_path] = entry
        self.model = entry["model"]
        self.model_params = entry["variables"]

    # ------------------------------------------------------------------ latents
    def init_params(self, key, init_tensor=None):
        h, w = self.canvas_height // 4, self.canvas_width // 4
        if init_tensor is None:
            return jax.random.uniform(key, (h, w, 3))
        return self.params_from_image(init_tensor)

    def params_from_image(self, image_tensor):
        img01 = (jnp.asarray(image_tensor) + 1.0) / 2.0
        h, w = self.canvas_height // 4, self.canvas_width // 4
        return jax.image.resize(img01, (h, w, 3), method="bilinear")

    def clip_params(self, z):
        return jnp.clip(z, 0.0, 1.0)

    # ------------------------------------------------------------------- render
    def synth(self, model_params, z, iteration, key=None):
        out = self.model.apply(model_params, z[None])[0]
        # crop to the exact canvas (latent rounding can overshoot by <4 px)
        out = out[: self.canvas_height, : self.canvas_width]
        return clamp_with_grad(out, 0.0, 1.0)
