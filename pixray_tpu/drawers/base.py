"""Drawer contract: a pytree-parameterized differentiable renderer.

The reference's DrawingInterface (/root/reference/DrawingInterface.py plus the
de-facto contract exercised from pixray.py:612-614, 718-727, 1104, 1206, 1346-1353,
1413-1420, 1487-1494, 1576-1608) is a mutable torch module holding ``self.z``.
The TPU-native re-design separates:

- ``z`` — the trainable latent, an explicit pytree owned by the engine's step state;
- ``model_params`` — frozen weights (possibly empty), passed into ``synth`` so jit
  treats them as runtime operands rather than baked constants;
- ``synth(model_params, z, iteration, key)`` — a PURE render function, jit/vmap/
  grad-safe, returning an (H, W, 3) or (H, W, 4) float image in [0, 1].

Host-side conveniences (to_image, PIL round-trips) live on the drawer object.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


class DrawingInterface:
    """Base drawer. Subclasses configure in __init__(settings) + load_model()."""

    #: does the drawer render RGBA (supports --transparent)?
    has_alpha = False

    @staticmethod
    def add_settings(parser):
        return parser

    def __init__(self, settings):
        self.canvas_width = settings.size[0]
        self.canvas_height = settings.size[1]
        self.model_params = {}

    # ------------------------------------------------------------------ setup
    def load_model(self, settings) -> None:
        """Load/convert frozen weights (host-side, once)."""

    def get_num_resolutions(self):
        """Decoder resolution count for canvas snapping (None = no snapping)."""
        return None

    def snap_canvas(self, size):
        """Snap the requested canvas to the drawer's resolution grid."""
        num_res = self.get_num_resolutions()
        if num_res is None:
            self.canvas_width, self.canvas_height = size
        else:
            f = 2 ** (num_res - 1)
            toks_x, toks_y = size[0] // f, size[1] // f
            self.canvas_width, self.canvas_height = toks_x * f, toks_y * f
        return self.canvas_width, self.canvas_height

    # ------------------------------------------------------------- latent ops
    def init_params(self, key, init_tensor=None):
        """Create the latent pytree; ``init_tensor`` is (H, W, 3) in [-1, 1] or None."""
        raise NotImplementedError

    def params_from_image(self, image_tensor):
        """Latent derived from an (H, W, 3) [-1, 1] image (reapply/get_z_from_tensor)."""
        raise NotImplementedError

    def clip_params(self, z):
        """Project the latent back into its valid region after an optimizer step (pure)."""
        return z

    # ----------------------------------------------------------------- render
    def synth(self, model_params, z, iteration, key=None):
        """PURE differentiable render to an (H, W, C) float image in [0, 1]."""
        raise NotImplementedError

    # ---------------------------------------------------------- optimizer hook
    def get_opts(self, args, decay_divisor: float):
        """Optional drawer-specific optimizer spec.

        Return None to use the engine's global optimiser (reference
        pixray.py:520-555), or a list of (optax transformation, param-filter fn)
        pairs for multi-group optimization (clipdraw-style).
        """
        return None

    # ------------------------------------------------------------------ host IO
    def to_image(self, z, iteration=0) -> Image.Image:
        import jax

        out = self.synth(self.model_params, z, iteration, key=jax.random.PRNGKey(0))
        arr = np.asarray(out)
        if arr.shape[-1] == 4:
            mode = "RGBA"
        else:
            mode = "RGB"
        return Image.fromarray((np.clip(arr, 0, 1) * 255.999).astype(np.uint8), mode)

    def to_svg(self, z) -> str:
        raise NotImplementedError(f"{type(self).__name__} has no vector export")
