"""FFT drawer: implicit image parameterized in Fourier / wavelet / pixel space.

Parity with /root/reference/fftdrawer.py, which wraps the ``aphantasia`` package's
fft_image/dwt_image/pixel_image + to_valid_rgb.  Here the parameterizations are
native JAX:

- fft:   latent = complex spectrum (as real/imag pair) over rfft2 frequencies,
         scaled by ``freq^-decay`` (Lucid-style), rendered via jnp.fft.irfftn;
- dwt:   latent = multi-level wavelet coefficient pyramid (``--fft_wave``:
         haar / db1..db20 / coif1..coif5, default coif2 like the reference),
         rendered by inverse DWT — each level is a pair of orthogonal matmuls
         per axis (ops/wavelets.py), so synthesis rides the MXU;
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


def dwt2(x, a_h, a_w):
    """One separable analysis level: (C, H, W) → LL, (LH, HL, HH).

    ``a_h``/``a_w`` are the orthogonal periodized analysis matrices for the
    level's input H and W (ops/wavelets.py); rows [0:N/2] are approximation,
    [N/2:] detail.  With the haar filter this reproduces the classic
    (a±b±c±d)/2 butterfly exactly.
    """
    y = jnp.einsum("ij,cjw->ciw", a_h, x)
    y = jnp.einsum("cjw,iw->cji", y, a_w)
    h2, w2 = a_h.shape[0] // 2, a_w.shape[0] // 2
    ll = y[:, :h2, :w2]
    lh = y[:, :h2, w2:]   # low along H, high along W
    hl = y[:, h2:, :w2]   # high along H, low along W
    hh = y[:, h2:, w2:]
    return ll, (lh, hl, hh)


def idwt2(ll, bands, a_h, a_w):
    """Exact inverse of dwt2 (synthesis = transposed matmuls)."""
    lh, hl, hh = bands
    y = jnp.concatenate(
        [jnp.concatenate([ll, lh], axis=2), jnp.concatenate([hl, hh], axis=2)],
        axis=1,
    )
    y = jnp.einsum("ij,cjw->ciw", a_h.T, y)
    return jnp.einsum("cjw,iw->cji", y, a_w.T)


class FftDrawer(DrawingInterface):
    learning_rate = None  # set from --fft_lrate in __init__

    @staticmethod
    def add_settings(parser):
        parser.add_argument("--fft_use", type=str, help="use fft or dwt or pixel", default="fft", dest="fft_use")
        parser.add_argument("--fft_decay", default=1.5, type=float, dest="fft_decay")
        parser.add_argument("--fft_wave", default="coif2", help="wavelets: db[1..20], coif[1..5], haar", dest="fft_wave")
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
        if self.fft_use == "dwt":
            from pixray_tpu.ops.wavelets import wavelet_filter

            self._dec_lo = wavelet_filter(self.wave)  # raises on unknown names
        # pad DWT canvas to a multiple of 2^levels
        self.dwt_levels = 4

    def snap_canvas(self, size):
        super().snap_canvas(size)
        self._scale = fft_scale(self.canvas_height, self.canvas_width, self.decay)
        if self.fft_use == "dwt":
            from pixray_tpu.ops.wavelets import analysis_matrix

            ph, pw = self._dwt_shapes()
            # per-level analysis matrices, level 0 = coarsest (matches the
            # bands{lvl} pyramid: synth applies lvl 0..levels-1 upward)
            self._dwt_mats = [
                (
                    jnp.asarray(analysis_matrix(ph >> (self.dwt_levels - 1 - lvl), self._dec_lo), jnp.float32),
                    jnp.asarray(analysis_matrix(pw >> (self.dwt_levels - 1 - lvl), self._dec_lo), jnp.float32),
                )
                for lvl in range(self.dwt_levels)
            ]
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
                x, bands = dwt2(x, *self._dwt_mats[lvl])
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
                x = idwt2(x, (b[0], b[1], b[2]), *self._dwt_mats[lvl])
            raw = x[:, :h, :w]
        else:
            raw = z
        img = raw.transpose(1, 2, 0) * self.contrast  # (H, W, 3)
        img = _decorrelate(img, self.colors)
        return jax.nn.sigmoid(img)
