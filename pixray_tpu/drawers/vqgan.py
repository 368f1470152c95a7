"""VQGAN drawer: latent = continuous code grid; synth = quantize + decode.

Parity with /root/reference/vqgan.py: model zoo table (URLs preserved for
provenance), global model cache, straight-through vector quantization, codebook
min/max latent clamping, resolution snapping via the decoder depth, clamped
(x+1)/2 output with gradient-preserving clamp.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.drawers.base import DrawingInterface
from pixray_tpu.models.vqgan import VQGAN, VQGAN_CONFIGS, convert_taming_vqgan
from pixray_tpu.ops.grad import clamp_with_grad

# reference checkpoint URL table (vqgan.py:33-46); auto-downloaded on first use
VQGAN_CHECKPOINT_URLS = {
    "imagenet_f16_1024": "http://mirror.io.community/blob/vqgan/vqgan_imagenet_f16_1024.ckpt",
    "imagenet_f16_16384": "https://heibox.uni-heidelberg.de/d/a7530b09fed84f80a887/files/?p=%2Fckpts%2Flast.ckpt&dl=1",
    "imagenet_f16_16384m": "http://mirror.io.community/blob/vqgan/vqgan_imagenet_f16_16384.ckpt",
    "openimages_f16_8192": "https://heibox.uni-heidelberg.de/d/2e5662443a6b4307b470/files/?p=%2Fckpts%2Flast.ckpt&dl=1",
    "coco": "https://dl.nmkd.de/ai/clip/coco/coco.ckpt",
    "faceshq": "https://app.koofr.net/content/links/a04deec9-0c59-4673-8b37-3d696fe63a5d/files/get/last.ckpt?path=%2F2020-11-13T21-41-45_faceshq_transformer%2Fcheckpoints%2Flast.ckpt",
    "wikiart_1024": "https://github.com/pixray/pixray/releases/download/v1.7.1/vqgan_wikiart_1024.ckpt",
    "wikiart_1024m": "http://mirror.io.community/blob/vqgan/wikiart.ckpt",
    "wikiart_16384": "https://github.com/pixray/pixray/releases/download/v1.7.1/vqgan_wikiart_16384.ckpt",
    "wikiart_16384m": "http://eaidata.bmk.sh/data/Wikiart_16384/wikiart_f16_16384_8145600.ckpt",
    "wikiart_16384m2": "http://mirror.io.community/blob/vqgan/wikiart_16384.ckpt",
    "sflckr": "https://heibox.uni-heidelberg.de/d/73487ab6e5314cb5adba/files/?p=%2Fcheckpoints%2Flast.ckpt&dl=1",
}
VQGAN_CHECKPOINT_TABLE = {
    name: f"models/vqgan_{name}.ckpt" for name in VQGAN_CONFIGS
}

_global_model_cache: dict = {}


class VqganDrawer(DrawingInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--vqgan_model", type=str, help="VQGAN model", default="imagenet_f16_16384", dest="vqgan_model")
        parser.add_argument("--vqgan_config", type=str, help="VQGAN config", default=None, dest="vqgan_config")
        parser.add_argument("--vqgan_checkpoint", type=str, help="VQGAN checkpoint", default=None, dest="vqgan_checkpoint")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.vqgan_model = settings.vqgan_model
        self.checkpoint_path = settings.vqgan_checkpoint or VQGAN_CHECKPOINT_TABLE.get(
            self.vqgan_model, f"models/vqgan_{self.vqgan_model}.ckpt"
        )

    def load_model(self, settings):
        cache_key = self.checkpoint_path
        if cache_key in _global_model_cache:
            print("reusing cached copy of model ", cache_key)
            entry = _global_model_cache[cache_key]
        else:
            config = VQGAN_CONFIGS.get(self.vqgan_model)
            if config is None:
                raise ValueError(f"unknown VQGAN model {self.vqgan_model}")
            model = VQGAN(config)
            if not os.path.exists(self.checkpoint_path) and self.vqgan_model in VQGAN_CHECKPOINT_URLS:
                from pixray_tpu.utils.download import wget_file

                wget_file(VQGAN_CHECKPOINT_URLS[self.vqgan_model], self.checkpoint_path)
            if os.path.exists(self.checkpoint_path):
                import torch

                ckpt = torch.load(self.checkpoint_path, map_location="cpu")
                sd = ckpt.get("state_dict", ckpt)
                sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
                variables = convert_taming_vqgan(sd, config)
                print(f"Loaded VQGAN {self.vqgan_model} from {self.checkpoint_path}")
            else:
                print(
                    f"WARNING: VQGAN checkpoint {self.checkpoint_path} not found — "
                    "random weights (place taming .ckpt files under models/)"
                )
                variables = model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
                )
            entry = {"model": model, "variables": variables, "config": config}
            _global_model_cache[cache_key] = entry

        self.model = entry["model"]
        self.config = entry["config"]
        self.model_params = entry["variables"]
        codebook = np.asarray(entry["variables"]["params"]["codebook"])
        self.z_min = jnp.asarray(codebook.min(axis=0))
        self.z_max = jnp.asarray(codebook.max(axis=0))
        self.gumbel = self.config.gumbel

    def get_num_resolutions(self):
        return self.config.num_resolutions

    # ------------------------------------------------------------------ latents
    def _encode(self, image_tensor):
        """[-1,1] (H, W, 3) image → quantized latent grid (h, w, embed_dim)."""
        out = self.model.apply(
            self.model_params, image_tensor[None], method=self.model.encode
        )
        return out[0]

    def init_params(self, key, init_tensor=None):
        f = 2 ** (self.config.num_resolutions - 1)
        toks_y, toks_x = self.canvas_height // f, self.canvas_width // f
        if init_tensor is None:
            # legacy one-hot random init (vqgan.py:163-172 semantics)
            codebook = self.model_params["params"]["codebook"]
            idx = jax.random.randint(key, (toks_y * toks_x,), 0, codebook.shape[0])
            return codebook[idx].reshape(toks_y, toks_x, -1)
        return self._encode(jnp.asarray(init_tensor))

    def params_from_image(self, image_tensor):
        return self._encode(jnp.asarray(image_tensor))

    def clip_params(self, z):
        return jnp.clip(z, self.z_min, self.z_max)

    # ------------------------------------------------------------------- render
    def synth(self, model_params, z, iteration, key=None):
        decoded = self.model.apply(
            model_params, z[None], method=self.model.decode_from_continuous
        )[0]
        return clamp_with_grad((decoded + 1.0) / 2.0, 0.0, 1.0)
