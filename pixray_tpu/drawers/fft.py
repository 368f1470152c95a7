"""FFT drawer: implicit image parameterized in Fourier / wavelet / pixel space.

Parity with /root/reference/fftdrawer.py, which wraps the ``aphantasia`` package's
fft_image/dwt_image/pixel_image + to_valid_rgb.  Here the parameterizations are
native JAX:

- fft:   latent = complex spectrum (as real/imag pair) over rfft2 frequencies,
         scaled by ``freq^-decay`` (Lucid-style), rendered via jnp.fft.irfftn;
- dwt:   latent = multi-level Haar wavelet coefficients, rendered by inverse DWT
         (other wavelet names fall back to haar with a note — the reference used
         pytorch_wavelets' coif2 by default);
- pixel: latent = raw pixel logits;

followed by Lucid color decorrelation and a sigmoid (to_valid_rgb semantics),
with the reference's contrast=0.9 render-time factor and per-drawer Adam lr 0.3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pixray_tpu.drawers.base import DrawingInterface

# Lucid color-decorrelation matrix (ImageNet empirical color SVD sqrt)
_COLOR_SVD_SQRT = np.asarray(
    [[0.26, 0.09, 0.02], [0.27, 0.00, -0.05], [0.27, -0.09, 0.03]], np.float32
)
_COLOR_NORM = _COLOR_SVD_SQRT / np.max(np.linalg.norm(_COLOR_SVD_SQRT, axis=0))
_MAGIC = 4.0  # Lucid's empirical scaling constant


def _decorrelate(image, colors=1.5):
    """(..., 3) linear color decorrelation scaled by the 'colors' strength."""
    mat = jnp.asarray(_COLOR_NORM) * colors
    return image @ mat.T


def _correlate_inverse(image, colors=1.5):
    mat = np.linalg.inv(_COLOR_NORM * colors)
    return image @ jnp.asarray(mat).T


def fft_scale(h, w, decay_power):
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    freqs = np.sqrt(fx**2 + fy**2)
    freqs = np.maximum(freqs, 1.0 / max(h, w))
    scale = 1.0 / freqs**decay_power
    scale *= np.sqrt(h * w)
    return jnp.asarray(scale[None], jnp.float32)  # (1, h, w//2+1)


def haar_dwt2(x):
    """One Haar analysis level: (C, H, W) → LL, (LH, HL, HH)."""
    a = x[:, 0::2, 0::2]
    b = x[:, 0::2, 1::2]
    c = x[:, 1::2, 0::2]
    d = x[:, 1::2, 1::2]
    ll = (a + b + c + d) / 2.0
    lh = (a - b + c - d) / 2.0
    hl = (a + b - c - d) / 2.0
    hh = (a - b - c + d) / 2.0
    return ll, (lh, hl, hh)


def haar_idwt2(ll, bands):
    lh, hl, hh = bands
    a = (ll + lh + hl + hh) / 2.0
    b = (ll - lh + hl - hh) / 2.0
    c = (ll + lh - hl - hh) / 2.0
    d = (ll - lh - hl + hh) / 2.0
    ch, h, w = ll.shape
    out = jnp.zeros((ch, h * 2, w * 2), ll.dtype)
    out = out.at[:, 0::2, 0::2].set(a)
    out = out.at[:, 0::2, 1::2].set(b)
    out = out.at[:, 1::2, 0::2].set(c)
    out = out.at[:, 1::2, 1::2].set(d)
    return out


class FftDrawer(DrawingInterface):
    learning_rate = None  # set from --fft_lrate in __init__

    @staticmethod
    def add_settings(parser):
        parser.add_argument("--fft_use", type=str, help="use fft or dwt or pixel", default="fft", dest="fft_use")
        parser.add_argument("--fft_decay", default=1.5, type=float, dest="fft_decay")
        parser.add_argument("--fft_wave", default="coif2", help="wavelets: haar supported natively", dest="fft_wave")
        parser.add_argument("--fft_sharp", default=0.3, type=float, dest="fft_sharp")
        parser.add_argument("--fft_colors", default=1.5, type=float, dest="fft_colors")
        parser.add_argument("--fft_lrate", default=0.3, type=float, help="Learning rate", dest="fft_lrate")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.fft_use = settings.fft_use
        self.decay = settings.fft_decay
        self.wave = settings.fft_wave
        self.colors = settings.fft_colors
        self.learning_rate = settings.fft_lrate
        self.contrast = 0.9  # reference fftdrawer.py:82
        if self.fft_use == "dwt" and self.wave != "haar":
            print(f"NOTE: wavelet {self.wave!r} not available natively; using haar")
        # pad DWT canvas to a multiple of 2^levels
        self.dwt_levels = 4

    def snap_canvas(self, size):
        super().snap_canvas(size)
        self._scale = fft_scale(self.canvas_height, self.canvas_width, self.decay)
        return self.canvas_width, self.canvas_height

    # ------------------------------------------------------------------ latents
    def _dwt_shapes(self):
        h = -(-self.canvas_height // (2**self.dwt_levels)) * (2**self.dwt_levels)
        w = -(-self.canvas_width // (2**self.dwt_levels)) * (2**self.dwt_levels)
        return h, w

    def init_params(self, key, init_tensor=None):
        h, w = self.canvas_height, self.canvas_width
        if init_tensor is not None:
            return self.params_from_image(init_tensor)
        if self.fft_use == "fft":
            return jax.random.normal(key, (3, h, w // 2 + 1, 2)) * 0.01
        if self.fft_use == "dwt":
            ph, pw = self._dwt_shapes()
            params = {"ll": jax.random.normal(key, (3, ph >> self.dwt_levels, pw >> self.dwt_levels)) * 0.1}
            for lvl in range(self.dwt_levels):
                k = jax.random.fold_in(key, lvl)
                sh, sw = ph >> (self.dwt_levels - lvl), pw >> (self.dwt_levels - lvl)
                params[f"bands{lvl}"] = jax.random.normal(k, (3, 3, sh, sw)) * 0.1
            return params
        if self.fft_use == "pixel":
            return jax.random.normal(key, (3, h, w)) * 1.0
        raise ValueError(f"fft drawer does not know how to apply fft_use={self.fft_use}")

    def _logits_from_image(self, image_tensor):
        """Invert to_valid_rgb: [-1,1] image → pre-sigmoid decorrelated logits."""
        img01 = jnp.clip((jnp.asarray(image_tensor) + 1.0) / 2.0, 1e-3, 1 - 1e-3)
        logits = jnp.log(img01 / (1.0 - img01))  # (H, W, 3)
        raw = _correlate_inverse(logits, self.colors)
        return raw.transpose(2, 0, 1) / self.contrast  # (3, H, W)

    def params_from_image(self, image_tensor):
        raw = self._logits_from_image(image_tensor)
        if self.fft_use == "fft":
            spectrum = jnp.fft.rfftn(raw * _MAGIC, axes=(1, 2), norm="ortho") / self._scale
            return jnp.stack([spectrum.real, spectrum.imag], axis=-1)
        if self.fft_use == "dwt":
            ph, pw = self._dwt_shapes()
            x = jnp.pad(raw, ((0, 0), (0, ph - raw.shape[1]), (0, pw - raw.shape[2])), mode="edge")
            params = {}
            for lvl in range(self.dwt_levels - 1, -1, -1):
                x, bands = haar_dwt2(x)
                params[f"bands{lvl}"] = jnp.stack(bands, axis=0)
            params["ll"] = x
            return params
        return raw

    # ------------------------------------------------------------------- render
    def synth(self, model_params, z, iteration, key=None):
        h, w = self.canvas_height, self.canvas_width
        if self.fft_use == "fft":
            spectrum = jax.lax.complex(z[..., 0], z[..., 1]) * self._scale
            raw = jnp.fft.irfftn(spectrum, s=(h, w), axes=(1, 2), norm="ortho") / _MAGIC
        elif self.fft_use == "dwt":
            x = z["ll"]
            for lvl in range(self.dwt_levels):
                b = z[f"bands{lvl}"]
                x = haar_idwt2(x, (b[0], b[1], b[2]))
            raw = x[:, :h, :w]
        else:
            raw = z
        img = raw.transpose(1, 2, 0) * self.contrast  # (H, W, 3)
        img = _decorrelate(img, self.colors)
        return jax.nn.sigmoid(img)
