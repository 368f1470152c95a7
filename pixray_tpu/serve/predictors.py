"""Serving layer: streaming predictors (Cog-compatible surface).

Parity with /root/reference/cogrun.py + cog_genesis.py: each product class maps a
small typed parameter schema onto engine settings, loads its base YAML from
``cogs/``, and streams intermediate result images by looping
``do_run(return_display=True)`` and yielding temp copies — the reference's
replicate.com contract (cogrun.py:25-52).

The ``cog`` package is optional: when present the same classes register as cog
predictors; without it they are plain Python generators usable from any HTTP
layer (see pixray_tpu.serve.http).
"""

from __future__ import annotations

import os
import pathlib
import shutil
import tempfile
from typing import Iterator

import yaml

from pixray_tpu.utils import get_single_rgb

COGS_DIR = os.environ.get(
    "PIXRAY_TPU_COGS", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "cogs")
)


def create_temporary_copy(src_path: str) -> str:
    _, suffix = os.path.splitext(src_path)
    temp_path = os.path.join(tempfile.gettempdir(), f"tempfile{suffix}")
    shutil.copy2(src_path, temp_path)
    return temp_path


class BasePixrayPredictor:
    """Streams partial results over the return_display contract."""

    def setup(self):
        print("---> BasePixrayPredictor Setup")

    def predict(self, settings: str, **kwargs) -> Iterator[pathlib.Path]:
        import pixray_tpu as pixray

        settings_file = os.path.join(COGS_DIR, f"{settings}.yaml")
        with open(settings_file, "r") as stream:
            base_settings = yaml.safe_load(stream)

        pixray.reset_settings()
        pixray.add_settings(**base_settings)
        pixray.add_settings(**kwargs)
        pixray.add_settings(skip_args=True)
        resolved = pixray.apply_settings()
        pixray.do_init(resolved)
        run_complete = False
        while not run_complete:
            run_complete = pixray.do_run(resolved, return_display=True)
            output_file = os.path.join(resolved.outdir, resolved.output)
            yield pathlib.Path(os.path.realpath(create_temporary_copy(output_file)))


class PixrayVqgan(BasePixrayPredictor):
    def predict(self, prompts: str = "rainbow mountain", quality: str = "normal",
                aspect: str = "widescreen", **kwargs) -> Iterator[pathlib.Path]:
        yield from super().predict(
            settings="pixray_vqgan", prompts=prompts, quality=quality, aspect=aspect, **kwargs
        )


class PixrayPixel(BasePixrayPredictor):
    def predict(self, prompts: str = "Beirut Skyline. #pixelart", aspect: str = "widescreen",
                drawer: str = "pixel", **kwargs) -> Iterator[pathlib.Path]:
        yield from super().predict(
            settings="pixray_pixel", prompts=prompts, aspect=aspect, drawer=drawer, **kwargs
        )


class Text2Image(BasePixrayPredictor):
    def predict(self, prompts: str = "Cairo skyline at sunset.", drawer: str = "vqgan",
                settings: str = "\n") -> Iterator[pathlib.Path]:
        ydict = yaml.safe_load(settings) or {}
        yield from super().predict(settings="text2image", prompts=prompts, drawer=drawer, **ydict)


class Text2Pixel(BasePixrayPredictor):
    def predict(self, prompts: str = "Manhattan skyline at sunset. #pixelart",
                aspect: str = "widescreen", pixel_scale: float = 1.0, **kwargs) -> Iterator[pathlib.Path]:
        yield from super().predict(
            settings="text2pixel", prompts=prompts, aspect=aspect, pixel_scale=pixel_scale, **kwargs
        )


class PixrayRaw(BasePixrayPredictor):
    def predict(self, prompts: str = "Manhattan skyline at sunset. #pixelart",
                settings: str = "\n") -> Iterator[pathlib.Path]:
        ydict = yaml.safe_load(settings) or {}
        yield from super().predict(settings="pixrayraw", prompts=prompts, **ydict)


class PixrayApi(BasePixrayPredictor):
    def predict(self, settings: str = "\n") -> Iterator[pathlib.Path]:
        ydict = yaml.safe_load(settings) or {}
        yield from super().predict(settings="pixrayapi", **ydict)


class Tiler(BasePixrayPredictor):
    def predict(self, prompts: str = "", pixelart: bool = False, mirror: bool = False,
                settings: str = "\n") -> Iterator[pathlib.Path]:
        ydict = yaml.safe_load(settings) or {}
        if pixelart:
            name = "tiler_pixel_shift" if mirror else "tiler_pixel"
            yield from super().predict(prompts=f"{prompts} #pixelart", settings=name, **ydict)
        else:
            name = "tiler_fft_shift" if mirror else "tiler_fft"
            yield from super().predict(prompts=prompts, settings=name, **ydict)


class PixrayVdiff(BasePixrayPredictor):
    def predict(self, prompts: str = "Manhattan skyline at sunset. #artstation 🌇",
                settings: str = "\n") -> Iterator[pathlib.Path]:
        ydict = yaml.safe_load(settings) or {}
        yield from super().predict(settings="pixray_vdiff", prompts=prompts, **ydict)


class EightBidG(BasePixrayPredictor):
    def predict(self, prompts: str = "", palette: str = "full color",
                border: str = "none") -> Iterator[pathlib.Path]:
        ydict: dict = {}
        if border == "none":
            ydict.update({"custom_loss": "smoothness:0.25"})
        else:
            ydict.update({
                "custom_loss": "edge,smoothness:0.25",
                "edge_thickness": 2,
                "edge_color": get_single_rgb(border),
            })
        if palette == "grayscale":
            ydict.update({"filters": "lookup", "palette": "black->white\\256"})
        elif palette == "web safe":
            ydict.update({"filters": "lookup", "palette": "https://www.pagetutor.com/common/net216pics/net216.gif"})
        yield from super().predict(prompts=prompts, settings="8bidg", **ydict)


class GenesisPredictor(BasePixrayPredictor):
    """Untitled-NFT genesis predictor (reference cog_genesis.py)."""

    def predict(self, title: str = "", quality: str = "draft",
                optional_settings: str = "\n") -> Iterator[pathlib.Path]:
        import pixray_tpu as pixray

        pixray.reset_settings()
        if quality == "draft":
            pixray.add_settings(output="genesis_draft.png", quality="draft", scale=2.5, iterations=100)
        else:
            pixray.add_settings(output="genesis.png", quality="best", scale=4, iterations=350)

        title = title.strip()
        if title in ("", "(untitled)"):
            title = "Wow, that looks amazing!|Trending on Artstation"
            pixray.add_settings(custom_loss="saturation")
        pixray.add_settings(prompts=title)

        optional_settings = optional_settings.strip()
        if optional_settings:
            ydict = yaml.safe_load(optional_settings)
            if ydict is not None:
                if ydict.get("drawer") == "pixel":
                    pixray.add_settings(prompts=f"{title} #pixelart")
                pixray.add_settings(**ydict)

        pixray.add_settings(skip_args=True)
        resolved = pixray.apply_settings()
        pixray.do_init(resolved)
        run_complete = False
        while not run_complete:
            run_complete = pixray.do_run(resolved, return_display=True)
            output_file = os.path.join(resolved.outdir, resolved.output)
            yield pathlib.Path(os.path.realpath(create_temporary_copy(output_file)))


PRODUCTS = {
    "text2image": Text2Image,
    "pixray_vqgan": PixrayVqgan,
    "pixray_pixel": PixrayPixel,
    "text2pixel": Text2Pixel,
    "pixrayraw": PixrayRaw,
    "pixrayapi": PixrayApi,
    "tiler": Tiler,
    "pixray_vdiff": PixrayVdiff,
    "8bidg": EightBidG,
    "genesis": GenesisPredictor,
}
