"""Palette DSL.

Parses the reference's palette mini-language (see /root/reference/util.py:103-259):

- named colors (xkcd by default, ``mat:`` prefix for matplotlib/CSS names)
- special pixel-art names (``pixel_green`` etc.)
- ``(255,0,0)`` / ``[1,0,0]`` literal triples (``+``-separated components)
- ``a->b->c`` ramps, ``\\N`` step-count suffixes, bare color = black->color ramp
- ``[a, b, c]`` explicit lists (optionally ``\\N``-resampled)
- ``;``-concatenated sections
- ``@file.png`` / ``@file.act`` palette extraction (URLs accepted where egress exists)

Image palette extraction uses PIL median-cut quantization instead of the reference's
ColorThief dependency (same MMCQ family of algorithms).
"""

from __future__ import annotations

import re
from codecs import encode

from .files import map_number

try:  # color-name tables; optional, like the reference (util.py:14-18)
    import matplotlib.colors as _mcolors
except ImportError:  # pragma: no cover
    _mcolors = None

_PIXEL_PALETTE = {
    "pixel_green": [0.44, 1.00, 0.53],
    "pixel_orange": [1.00, 0.80, 0.20],
    "pixel_blue": [0.44, 0.53, 1.00],
    "pixel_red": [1.00, 0.53, 0.44],
    "pixel_grayscale": [1.00, 1.00, 1.00],
}


def parse_triple_to_rgb(s: str) -> list[float]:
    """Parse ``(255,255,0)`` (0-255) or ``[1,1,0]`` (0-1) literals.

    Components may be separated by ``+`` or ``,`` (the reference strips parens and
    splits on ``+`` because its callers pre-split on commas; we accept both).
    """
    body = re.sub(r"[(\[\])]", "", s)
    parts = re.split(r"[+,]", body)
    rgb = [float(n) for n in parts]
    if s[0] == "(":
        rgb = [n / 255.0 for n in rgb]
    return rgb


def get_single_rgb(s: str):
    """Resolve one color token to an RGB triple in [0,1]."""
    if s[0] == "(" or s[0] == "[":
        return parse_triple_to_rgb(s)
    if s in _PIXEL_PALETTE:
        return _PIXEL_PALETTE[s]
    if _mcolors is None:
        raise ValueError(f"matplotlib unavailable; cannot resolve color name {s!r}")
    if s[:4] == "mat:":
        return list(_mcolors.to_rgb(s[4:]))
    if _mcolors.is_color_like(f"xkcd:{s}"):
        return list(_mcolors.to_rgb(f"xkcd:{s}"))
    return list(_mcolors.to_rgb(s))


def expand_colors(colors, num_steps: int):
    """Piecewise-linear resample of a color list to ``num_steps`` entries."""
    eps = 1e-6
    pal = []
    num_colors = len(colors)
    for n in range(num_steps):
        f = map_number(n, 0, num_steps - 1, 0, num_colors - 1) if num_steps > 1 else 0.0
        i = int(f)
        off = f - i
        if off < eps or (1.0 - off) < eps:
            pal.append(list(colors[i]))
        else:
            c1, c2 = colors[i], colors[i + 1]
            pal.append([map_number(off, 0, 1, c1[k], c2[k]) for k in range(3)])
    return pal


def _split_steps(s: str, default=None):
    """Split an optional ``\\N`` step-count suffix off a section."""
    if s.find("\\") > 0:
        stem, steps = s.split("\\")
        return stem, int(steps)
    return s, default


def get_rgb_range(s: str):
    """``a->b->c`` ramp (or bare color = black->color), default 16 steps."""
    parts = s.split("->") if s.find("->") > 0 else ["black", s]
    parts[-1], num_steps = _split_steps(parts[-1], 16)
    colors = [get_single_rgb(p) for p in parts]
    return expand_colors(colors, num_steps)


def _palette_from_image(path: str, num_steps):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if num_steps is None:
        num_steps = 255
    color_pairs = img.getcolors(img.size[0] * img.size[1])
    if color_pairs is not None and len(color_pairs) <= num_steps:
        return [[c[1][0] / 255.0, c[1][1] / 255.0, c[1][2] / 255.0] for c in color_pairs]
    # median-cut quantization (PIL) replaces the reference's ColorThief dependency
    quantized = img.quantize(colors=num_steps, method=Image.Quantize.MEDIANCUT)
    raw = quantized.getpalette()[: num_steps * 3]
    return [[raw[i] / 255.0, raw[i + 1] / 255.0, raw[i + 2] / 255.0] for i in range(0, len(raw), 3)]


def _palette_from_act(path: str):
    """Photoshop .act palette file (util.py:228-247 semantics)."""
    with open(path, "rb") as act:
        raw_data = act.read()
    hex_data = encode(raw_data, "hex")
    total_colors_count = int(hex_data[-7:-4], 16)
    colors = [hex_data[i : i + 6].decode() for i in range(0, total_colors_count * 6, 6)]
    colors = ["#" + c for c in colors if len(c)]
    return [get_single_rgb(c) for c in colors]


def palette_from_section(s: str):
    """Parse one ``;``-delimited palette section."""
    s = s.strip()
    if s[0] == "[":
        stem, num_steps = _split_steps(s)
        chunks = stem[1:-1].split(",")
        pal = [get_single_rgb(c.strip()) for c in chunks]
        if num_steps is not None:
            pal = expand_colors(pal, num_steps)
        return pal
    if s[0] == "@" or s[:4] == "http":
        stem, num_steps = _split_steps(s)
        path = stem[1:] if stem[0] == "@" else stem
        if stem.endswith((".png", ".jpg", ".gif")):
            return _palette_from_image(path, num_steps)
        if stem.endswith(".act"):
            return _palette_from_act(path)
        raise ValueError(f"Unknown file type: {s}")
    return get_rgb_range(s)


def palette_from_string(s: str):
    """Parse a full palette string: ``;``-concatenated sections."""
    pal = []
    for chunk in s.strip().split(";"):
        pal = pal + palette_from_section(chunk)
    return pal
