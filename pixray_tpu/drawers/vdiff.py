"""v-diffusion drawer: each engine iteration is one CLIP-guided sampler step.

Parity with /root/reference/vdiff.py: latent = the current diffusion state x;
``synth(x, i)`` runs the v-objective model and exposes the denoised ``pred`` to
CLIP gradients; the canvas is rounded up to 128 and center-cropped back; after
every optimizer step the engine re-noises x to the next timestep and rebuilds a
fresh Adam with lr = min(sigma_i/alpha_i · 0.001, 0.01) (pixray.py:1489-1495);
cc12m models consume a weighted-prompt ``clip_embed`` (pixray.py:879-885).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pixray_tpu.drawers.base import DrawingInterface
from pixray_tpu.models.vdiff import (
    get_log_schedule,
    get_spliced_ddpm_cosine_schedule,
    load_vdiff_model,
    sample_noise,
    sample_setup,
    sample_step,
)
from pixray_tpu.ops.grad import clamp_with_grad
from pixray_tpu.utils import map_number

ROUNDUP_SIZE = 128


def roundup(x, n):
    return int(math.ceil(x / float(n))) * n


class VdiffDrawer(DrawingInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--vdiff_model", type=str, help="VDIFF model from [yfcc_2, yfcc_1, cc12m_1, cc12m_1_cfg, ...]", default="yfcc_2", dest="vdiff_model")
        parser.add_argument("--vdiff_schedule", type=str, help="VDIFF schedule [default, log]", default="default", dest="vdiff_schedule")
        parser.add_argument("--vdiff_skip", type=float, help="skip a percentage of the decay schedule (0-100)", default=0, dest="vdiff_skip")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.vdiff_model = settings.vdiff_model
        self.gen_width = roundup(self.canvas_width, ROUNDUP_SIZE)
        self.gen_height = roundup(self.canvas_height, ROUNDUP_SIZE)
        self.iterations = settings.iterations
        self.schedule = settings.vdiff_schedule
        self.eta = 1.0
        self.vdiff_skip = settings.vdiff_skip
        self.clip_embed = None
        self.learning_rate = 0.01  # replaced per-step by post_step
        self._post_fn = None  # jitted re-noise step (params as arguments)

    def load_model(self, settings):
        self.model, variables, self.config = load_vdiff_model(self.vdiff_model)
        self.clip_model = self.config.clip_model
        if self.clip_model is not None:
            assert self.clip_model in settings.clip_models, (
                f"try adding {self.clip_model} to clip_models settings - vdiff model "
                f"{self.vdiff_model} needs it but it is not active"
            )
        self.model_params = {"unet": variables}

        # schedule (vdiff.py:114-125): t from (1 - skip%) down to 0
        top_val = map_number(self.vdiff_skip, 0, 100, 1, 0)
        t = jnp.linspace(top_val, 0.0, self.iterations + 2)[:-1]
        if self.schedule == "log":
            steps = get_log_schedule(t)
        else:
            steps = get_spliced_ddpm_cosine_schedule(t)
        self.sample_state = sample_setup(self._model_fn, steps, self.eta, {})

    def _model_fn(self, x, t, extra):
        variables = extra.get("params", None)
        if variables is None:
            variables = self.model_params["unet"]
        clip_embed = extra.get("clip_embed", self.clip_embed)
        return self.model.apply(
            variables, x, jnp.atleast_1d(t),
            clip_embed if self.config.clip_model else None,
        )

    def set_clip_embed(self, clip_embed):
        """Weighted prompt embedding for cc12m conditioning (pixray.py:879-885).

        Stored inside model_params so it rides the jitted step as an ARGUMENT
        (refs pytree) — a plain attribute would be traced into compiled graphs
        as a constant and go stale if re-set afterwards."""
        self.clip_embed = jnp.asarray(clip_embed)
        self.model_params = dict(self.model_params, clip_embed=self.clip_embed)

    # ------------------------------------------------------------------ latents
    def init_params(self, key, init_tensor=None):
        x = jax.random.normal(key, (1, self.gen_height, self.gen_width, 3))
        if init_tensor is not None:
            new_x = jnp.zeros_like(x)
            my = (self.gen_height - self.canvas_height) // 2
            mx = (self.gen_width - self.canvas_width) // 2
            new_x = jax.lax.dynamic_update_slice(
                new_x, jnp.asarray(init_tensor)[None], (0, my, mx, 0)
            )
            alpha0 = self.sample_state.alphas[0]
            sigma0 = self.sample_state.sigmas[0]
            x = new_x * alpha0 + x * sigma0
        return x

    def params_from_image(self, image_tensor):
        # the reference cannot re-encode into diffusion state either (vdiff.py:147-151)
        raise NotImplementedError("vdiff cannot re-encode images into x")

    # ------------------------------------------------------------------- render
    @property
    def _variables(self):
        return self.model_params["unet"]

    def _extra(self, model_params):
        extra = {"params": model_params["unet"]}
        if "clip_embed" in model_params:
            extra["clip_embed"] = model_params["clip_embed"]
        return extra

    def synth(self, model_params, z, iteration, key=None):
        # params flow through sample_step's extra_args — assigning them to
        # self here would leak tracers into drawer state under jit AND turn
        # the weights into jaxpr constants in any closure-jitted caller
        pred, _v = sample_step(
            self.sample_state, z, iteration, self._extra(model_params)
        )
        pixels = clamp_with_grad((pred + 1.0) / 2.0, 0.0, 1.0)[0]
        my = (self.gen_height - self.canvas_height) // 2
        mx = (self.gen_width - self.canvas_width) // 2
        if my or mx:
            pixels = jax.lax.dynamic_slice(
                pixels, (my, mx, 0), (self.canvas_height, self.canvas_width, 3)
            )
        return pixels

    # ------------------------------------------------------- per-step re-noising
    def post_step(self, z, cur_it):
        """Engine hook after each optimizer step (pixray.py:1489-1495): re-noise x
        to the next timestep and request a fresh Adam at the schedule-derived LR.

        Returns the new latent, or None when no reset should happen."""
        if cur_it < 1:
            return None
        alphas, sigmas = self.sample_state.alphas, self.sample_state.sigmas
        lr = float(sigmas[cur_it] / jnp.maximum(alphas[cur_it], 1e-8))
        self.learning_rate = min(lr * 0.001, 0.01)

        if self._post_fn is None:
            def _post(model_params, z, i, key):
                extra = self._extra(model_params)
                pred, v = sample_step(self.sample_state, z, i, extra)
                new_x = sample_noise(self.sample_state, z, i, pred, v, key)
                return jax.lax.stop_gradient(new_x)

            # ONE compiled graph for every re-noise step (i is traced);
            # weights/conditioning are arguments, never captured constants
            self._post_fn = jax.jit(_post)
        return self._post_fn(
            self.model_params, z, jnp.asarray(cur_it), jax.random.PRNGKey(cur_it)
        )
