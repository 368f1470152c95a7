"""Procedural init-image generators.

Re-implements the reference's init-noise family (/root/reference/pixray.py:192-246)
without the ``perlin-numpy`` dependency: fractal (multi-octave) Perlin noise,
contrast curves, random gradients, and uniform "snow".  These run once at init on
the host, so they are plain numpy; the hot path never touches them.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def _perlin_2d(shape, res, rng: np.random.Generator):
    """Single-octave 2D Perlin noise on a ``shape`` grid with ``res`` cells."""
    d0, d1 = shape[0] // res[0], shape[1] // res[1]
    # random unit gradients at lattice corners
    angles = 2 * np.pi * rng.random((res[0] + 1, res[1] + 1))
    gradients = np.stack([np.cos(angles), np.sin(angles)], axis=-1)

    # local coordinates within each cell
    gy, gx = np.meshgrid(
        np.arange(shape[0]) / d0 % 1, np.arange(shape[1]) / d1 % 1, indexing="ij"
    )
    cy = (np.arange(shape[0]) // d0).astype(int)
    cx = (np.arange(shape[1]) // d1).astype(int)

    def dot_corner(oy, ox):
        g = gradients[cy[:, None] + oy, cx[None, :] + ox]  # (H, W, 2)
        return (gy - oy) * g[..., 0] + (gx - ox) * g[..., 1]

    def fade(t):
        return 6 * t**5 - 15 * t**4 + 10 * t**3

    u, v = fade(gy), fade(gx)
    n00, n01 = dot_corner(0, 0), dot_corner(0, 1)
    n10, n11 = dot_corner(1, 0), dot_corner(1, 1)
    top = n00 * (1 - v) + n01 * v
    bot = n10 * (1 - v) + n11 * v
    return np.sqrt(2) * (top * (1 - u) + bot * u)


def fractal_noise_2d(shape, res, octaves: int, rng: np.random.Generator, persistence=0.5):
    """Multi-octave fractal Perlin noise (perlin-numpy equivalent)."""
    noise = np.zeros(shape)
    frequency, amplitude = 1, 1.0
    for _ in range(octaves):
        noise += amplitude * _perlin_2d(
            shape, (frequency * res[0], frequency * res[1]), rng
        )
        frequency *= 2
        amplitude *= persistence
    return noise


def _normalize(data):
    lo, hi = np.min(data), np.max(data)
    return (data - lo) / (hi - lo) if hi > lo else np.zeros_like(data)


def contrast_noise(n):
    """S-curve contrast boost (pixray.py:200-205 semantics)."""
    n = 0.9998 * n + 0.0001
    n3 = 1 / (1 + np.power(n / (1 - n), -2))
    return n3


def random_noise_image(w: int, h: int, rng: np.random.Generator | None = None) -> Image.Image:
    """Fractal-noise RGB init image (pixray.py:207-224 semantics)."""
    rng = rng or np.random.default_rng()
    if w > 1024 or h > 1024:
        side, octp = 2048, 6
    elif w > 512 or h > 512:
        side, octp = 1024, 5
    elif w > 256 or h > 256:
        side, octp = 512, 4
    else:
        side, octp = 256, 3

    channels = [
        contrast_noise(_normalize(fractal_noise_2d((side, side), (32, 32), octp, rng)))
        for _ in range(3)
    ]
    stack = np.dstack(channels)[:h, :w, :]
    return Image.fromarray((255.999 * stack).astype("uint8"))


def random_gradient_image(w: int, h: int, rng: np.random.Generator | None = None) -> Image.Image:
    """Random linear-gradient RGB init image (pixray.py:227-246 semantics)."""
    rng = rng or np.random.default_rng()
    starts = (0, 0, rng.integers(0, 255))
    stops = (rng.integers(1, 255), rng.integers(2, 255), rng.integers(3, 128))
    horiz = (True, False, False)
    result = np.zeros((h, w, 3), dtype=float)
    for i, (start, stop, is_h) in enumerate(zip(starts, stops, horiz)):
        ramp = np.linspace(start, stop, w if is_h else h)
        result[:, :, i] = np.tile(ramp, (h, 1)) if is_h else np.tile(ramp, (w, 1)).T
    return Image.fromarray(np.uint8(result))


def old_random_noise_image(w: int, h: int, rng: np.random.Generator | None = None) -> Image.Image:
    """Uniform 'snow' init image (pixray.py:192-194 semantics)."""
    rng = rng or np.random.default_rng()
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
