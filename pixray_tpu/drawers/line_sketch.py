"""Line-sketch drawer: long fixed-black strokes on a paper-colored background.

Parity with /root/reference/linedrawer.py: ``--strokes`` paths of
``--stroke_length`` cubic segments, centered random-walk init, paper color
#f2eecb (optionally trainable via --allow_paper_color), widths clamped to
[1, max], fixed black stroke color, per-group Adam LRs (points 1.0, widths 0.1,
paper 0.01).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixray_tpu.drawers.base import DrawingInterface
from pixray_tpu.ops.strokes import bezier_basis, render_strokes_auto
from pixray_tpu.utils import str2bool

PAPER_COLOR = (242 / 255.0, 238 / 255.0, 203 / 255.0)


class LineDrawer(DrawingInterface):
    @staticmethod
    def add_settings(parser):
        parser.add_argument("--strokes", type=int, help="number strokes", default=24, dest="strokes")
        parser.add_argument("--stroke_length", type=int, help="stroke length", default=8, dest="stroke_length")
        parser.add_argument("--min_stroke_width", type=float, help="min width (percent of height)", default=0.5, dest="min_stroke_width")
        parser.add_argument("--max_stroke_width", type=float, help="max width (percent of height)", default=2, dest="max_stroke_width")
        parser.add_argument("--allow_paper_color", type=str2bool, help="allow paper color to change", default=False, dest="allow_paper_color")
        return parser

    def __init__(self, settings):
        super().__init__(settings)
        self.num_paths = settings.strokes
        self.stroke_length = settings.stroke_length
        self.max_width = settings.max_stroke_width * self.canvas_height / 100
        self.min_width = settings.min_stroke_width * self.canvas_height / 100
        self.allow_paper_color = settings.allow_paper_color

    def load_model(self, settings):
        pass

    def _init_strokes(self, rng: np.random.Generator):
        """Centered random-walk init (linedrawer.py:76-95)."""
        n = self.num_paths
        segs = self.stroke_length
        v = 1 + 3 * segs
        pts = np.zeros((n, v, 2), dtype=np.float32)
        for i in range(n):
            radius = 0.5
            radius_x = 0.5
            p0 = np.array([0.5 + radius_x * (rng.random() - 0.5), 0.5 + radius * (rng.random() - 0.5)])
            pts[i, 0] = p0
            idx = 1
            for _ in range(segs):
                radius = 1.0 / (segs + 2)
                radius_x = radius * self.canvas_height / self.canvas_width
                for _ in range(3):
                    p0 = p0 + np.array([radius_x, radius]) * (np.array([rng.random(), rng.random()]) - 0.5)
                    pts[i, idx] = p0
                    idx += 1
                p0 = np.clip(p0, 0, 1)
        pts[:, :, 0] *= self.canvas_width
        pts[:, :, 1] *= self.canvas_height
        return pts

    def init_params(self, key, init_tensor=None):
        rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
        pts = self._init_strokes(rng)
        self.model_params = {
            "basis": bezier_basis([self.stroke_length] * self.num_paths, self.stroke_length)
        }
        z = {
            "points": jnp.asarray(pts),
            "widths": jnp.full((self.num_paths,), self.max_width / 10.0),
        }
        if self.allow_paper_color:
            z["paper"] = jnp.asarray(PAPER_COLOR)
        return z

    def params_from_image(self, image_tensor):
        raise NotImplementedError("line_sketch cannot re-encode images (reference TODO)")

    def clip_params(self, z):
        out = {
            "points": z["points"],
            "widths": jnp.clip(z["widths"], 1.0, self.max_width),
        }
        if "paper" in z:
            out["paper"] = jnp.clip(z["paper"], 0.0, 1.0)
        return out

    def get_opts(self, args, decay_divisor: float):
        groups = {
            "points": optax.adam(1.0 / decay_divisor),
            "widths": optax.adam(0.1 / decay_divisor),
        }
        labels = {"points": "points", "widths": "widths"}
        if self.allow_paper_color:
            groups["paper"] = optax.adam(0.01 / decay_divisor)
            labels["paper"] = "paper"
        return optax.multi_transform(groups, param_labels=labels)

    def synth(self, model_params, z, iteration, key=None):
        paper = z.get("paper", jnp.asarray(PAPER_COLOR))
        bg = jnp.broadcast_to(paper, (self.canvas_height, self.canvas_width, 3))
        colors = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), (self.num_paths, 4)
        )
        out = render_strokes_auto(
            z["points"], z["widths"], colors, model_params["basis"],
            self.canvas_height, self.canvas_width, bg,
        )
        return out[..., :3]

    def to_svg(self, z) -> str:
        pts = np.asarray(z["points"])
        widths = np.asarray(z["widths"])
        paper = np.asarray(z.get("paper", jnp.asarray(PAPER_COLOR)))
        r, g, b = (np.clip(paper, 0, 1) * 255).astype(int)
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.canvas_width}" '
            f'height="{self.canvas_height}" viewBox="0 0 {self.canvas_width} {self.canvas_height}">',
            f'<rect width="{self.canvas_width}" height="{self.canvas_height}" fill="rgb({r},{g},{b})"/>',
        ]
        for i in range(pts.shape[0]):
            d = f"M {pts[i, 0, 0]:.2f},{pts[i, 0, 1]:.2f} "
            for s in range(self.stroke_length):
                c = pts[i, 1 + 3 * s : 4 + 3 * s]
                d += (
                    f"C {c[0, 0]:.2f},{c[0, 1]:.2f} {c[1, 0]:.2f},{c[1, 1]:.2f} "
                    f"{c[2, 0]:.2f},{c[2, 1]:.2f} "
                )
            parts.append(
                f'<path d="{d}" fill="none" stroke="black" stroke-width="{widths[i]:.2f}"/>'
            )
        parts.append("</svg>")
        return "\n".join(parts)
