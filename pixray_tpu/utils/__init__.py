from .files import (
    brace_expand,
    emit_filename,
    get_file_path,
    map_number,
    parse_unit,
    real_glob,
    split_pipes,
    str2bool,
)
from .palette import expand_colors, get_single_rgb, palette_from_string
from .noise import (
    old_random_noise_image,
    random_gradient_image,
    random_noise_image,
)
from .provenance import build_png_info, framework_version

__all__ = [
    "brace_expand",
    "emit_filename",
    "get_file_path",
    "map_number",
    "parse_unit",
    "real_glob",
    "split_pipes",
    "str2bool",
    "expand_colors",
    "get_single_rgb",
    "palette_from_string",
    "old_random_noise_image",
    "random_gradient_image",
    "random_noise_image",
    "build_png_info",
    "framework_version",
]
