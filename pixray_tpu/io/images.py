"""Host-side image IO: loading, Lanczos resizing, tensor conversion, spot masks.

These run at init/checkin boundaries only (the reference's PIL round-trips,
pixray.py:674-747, 1408-1420); the hot path never touches PIL.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from pixray_tpu.utils import real_glob


def open_image(path_or_url: str) -> Image.Image:
    if "http" in str(path_or_url):
        from urllib.request import urlopen

        return Image.open(urlopen(path_or_url))
    return Image.open(path_or_url)


def open_images(spec: str) -> list[Image.Image]:
    """Open one URL or a brace-glob of local files (reference init/overlay loading)."""
    if "http" in spec:
        return [open_image(spec)]
    return [Image.open(f) for f in real_glob(spec)]


def to_tensor(img: Image.Image) -> np.ndarray:
    """PIL → (H, W, C) float32 in [0, 1]."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def from_tensor(arr) -> Image.Image:
    """(H, W, C) float in [0,1] → PIL."""
    arr = np.asarray(arr)
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    return Image.fromarray((np.clip(arr, 0, 1) * 255.999).astype(np.uint8), mode)


def resize_area_preserving(image: Image.Image, out_size) -> Image.Image:
    """Aspect-preserving area-capped resize (reference resize_image, pixray.py:514-518)."""
    ratio = image.size[0] / image.size[1]
    area = min(image.size[0] * image.size[1], out_size[0] * out_size[1])
    size = round((area * ratio) ** 0.5), round((area / ratio) ** 0.5)
    return image.resize(size, Image.LANCZOS)


def load_image_rgb(path: str, size_wh) -> np.ndarray:
    img = open_image(path).convert("RGB").resize(size_wh, Image.LANCZOS)
    return to_tensor(img)


def load_image_for_perceptor(path: str, resolution: int) -> np.ndarray:
    """Resize-shorter-side + center-crop to the perceptor resolution (slip.py:52-56)."""
    img = open_image(path).convert("RGB")
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    left = (w - resolution) // 2
    top = (h - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    return to_tensor(img)


def default_spot_mask(size: int, aspect: float) -> np.ndarray:
    """Procedural spot mask replacing the reference's bundled
    inputs/spot_{square,wide}.png assets (pixray.py:377-394).

    Convention matches those assets: WHITE (1) = background ring, BLACK (0) =
    the centered subject ellipse (~40% area).  Spot prompts zero the white
    region (pixray.py:453-466), so they score the centered subject; spot_off
    prompts score the ring."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    cx = cy = (size - 1) / 2
    rx = size * (0.42 if aspect <= 1 else 0.48)
    ry = size * 0.36
    subject = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2 <= 1.0
    return 1.0 - subject.astype(np.float32)


def load_spot_mask(spot_file, size: int, aspect: float) -> np.ndarray:
    """Spot mask at perceptor resolution: ≥0.5 → spot-on region (pixray.py:386-392)."""
    if spot_file is None:
        return default_spot_mask(size, aspect)
    img = open_image(spot_file).convert("L").resize((size, size), Image.LANCZOS)
    return (np.asarray(img, dtype=np.float32) / 255.0 >= 0.5).astype(np.float32)
