"""ClipDraw drawer: up to 1024 trainable Bézier stroke paths.

Parity with /root/reference/clipdrawer.py (random 1-3-segment cubic curves,
trainable points/widths/RGBA stroke colors with per-group Adam LRs 1.0/0.1/0.01,
white-composited output, width/color clamps).  Rendering via the TPU-native
stroke rasterizer (ops/strokes.py) instead of diffvg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixray_tpu.drawers.base import DrawingInterface
from pixray_tpu.ops.strokes import bezier_basis, render_strokes_auto

MAX_SEGMENTS = 3


class ClipDrawer(DrawingInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--strokes", type=int, help="number strokes", default=1024, dest="strokes")
        parser.add_argument("--min_stroke_width", type=float, help="min width (percent of height)", default=1, dest="min_stroke_width")
        parser.add_argument("--max_stroke_width", type=float, help="max width (percent of height)", default=5, dest="max_stroke_width")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.num_paths = settings.strokes
        self.max_width = settings.max_stroke_width * self.canvas_height / 100
        self.min_width = settings.min_stroke_width * self.canvas_height / 100

    def load_model(self, settings):
        pass

    def _init_strokes(self, rng: np.random.Generator):
        """Random curve init (clipdrawer.py:47-71): 1-3 segments, 0.1-radius walk."""
        n = self.num_paths
        seg_counts = rng.integers(1, MAX_SEGMENTS + 1, size=n)
        v = 1 + 3 * MAX_SEGMENTS
        pts = np.zeros((n, v, 2), dtype=np.float32)
        for i in range(n):
            p0 = np.array([rng.random(), rng.random()])
            pts[i, 0] = p0
            radius = 0.1
            idx = 1
            for _ in range(seg_counts[i]):
                for _ in range(3):
                    p0 = p0 + radius * (np.array([rng.random(), rng.random()]) - 0.5)
                    pts[i, idx] = p0
                    idx += 1
            # pad remaining control points at the endpoint (degenerate tail)
            while idx < v:
                pts[i, idx] = p0
                idx += 1
        pts[:, :, 0] *= self.canvas_width
        pts[:, :, 1] *= self.canvas_height
        return seg_counts, pts

    def init_params(self, key, init_tensor=None):
        rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
        seg_counts, pts = self._init_strokes(rng)
        self.model_params = {
            "basis": bezier_basis(seg_counts, MAX_SEGMENTS),
        }
        widths = np.full((self.num_paths,), (self.min_width + self.max_width) / 4, np.float32)
        colors = rng.random((self.num_paths, 4)).astype(np.float32)
        return {
            "points": jnp.asarray(pts),
            "widths": jnp.asarray(widths),
            "colors": jnp.asarray(colors),
        }

    def params_from_image(self, image_tensor):
        raise NotImplementedError("clipdraw cannot re-encode images (reference TODO)")

    def clip_params(self, z):
        return {
            "points": z["points"],
            "widths": jnp.clip(z["widths"], self.min_width, self.max_width),
            "colors": jnp.clip(z["colors"], 0.0, 1.0),
        }

    def get_opts(self, args, decay_divisor: float):
        """Per-group Adam LRs (clipdrawer.py:102-108)."""
        return optax.multi_transform(
            {
                "points": optax.adam(1.0 / decay_divisor),
                "widths": optax.adam(0.1 / decay_divisor),
                "colors": optax.adam(0.01 / decay_divisor),
            },
            param_labels={"points": "points", "widths": "widths", "colors": "colors"},
        )

    def synth(self, model_params, z, iteration, key=None):
        bg = jnp.ones((self.canvas_height, self.canvas_width, 3))
        out = render_strokes_auto(
            z["points"], z["widths"], z["colors"], model_params["basis"],
            self.canvas_height, self.canvas_width, bg,
        )
        # composite over white (clipdrawer.py:133-134) → opaque RGB
        return out[..., :3]

    def to_svg(self, z) -> str:
        pts = np.asarray(z["points"])
        widths = np.asarray(z["widths"])
        colors = np.asarray(z["colors"])
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.canvas_width}" '
            f'height="{self.canvas_height}" viewBox="0 0 {self.canvas_width} {self.canvas_height}">'
        ]
        for i in range(pts.shape[0]):
            d = f"M {pts[i, 0, 0]:.2f},{pts[i, 0, 1]:.2f} "
            for s in range(MAX_SEGMENTS):
                c = pts[i, 1 + 3 * s : 4 + 3 * s]
                d += (
                    f"C {c[0, 0]:.2f},{c[0, 1]:.2f} {c[1, 0]:.2f},{c[1, 1]:.2f} "
                    f"{c[2, 0]:.2f},{c[2, 1]:.2f} "
                )
            r, g, b = (np.clip(colors[i, :3], 0, 1) * 255).astype(int)
            a = float(np.clip(colors[i, 3], 0, 1))
            parts.append(
                f'<path d="{d}" fill="none" stroke="rgb({r},{g},{b})" '
                f'stroke-opacity="{a:.3f}" stroke-width="{widths[i]:.2f}"/>'
            )
        parts.append("</svg>")
        return "\n".join(parts)
