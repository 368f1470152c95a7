import numpy as np
import pytest

from pixray_tpu.utils import get_single_rgb, palette_from_string


def test_named_color_red():
    assert get_single_rgb("red") == pytest.approx([0.898, 0.0, 0.0], abs=0.02)  # xkcd red


def test_mat_prefix():
    assert get_single_rgb("mat:red") == pytest.approx([1.0, 0.0, 0.0])


def test_paren_triple():
    assert get_single_rgb("(255,0,0)") == pytest.approx([1.0, 0.0, 0.0])


def test_bracket_triple():
    assert get_single_rgb("[1+0+0]") == pytest.approx([1.0, 0.0, 0.0])


def test_default_ramp_16():
    pal = palette_from_string("white")
    assert len(pal) == 16
    assert pal[0] == pytest.approx([0.0, 0.0, 0.0])  # black start
    assert pal[-1] == pytest.approx([1.0, 1.0, 1.0])


def test_ramp_with_steps():
    assert len(palette_from_string("red\\8")) == 8


def test_two_color_ramp():
    pal = palette_from_string("mat:black->mat:white\\3")
    assert pal[1] == pytest.approx([0.5, 0.5, 0.5])


def test_explicit_list():
    pal = palette_from_string("[mat:black, mat:red, mat:white]")
    assert len(pal) == 3


def test_sections_concat():
    pal = palette_from_string("red\\8;blue->yellow\\8")
    assert len(pal) == 16


def test_list_with_resample():
    pal = palette_from_string("[mat:black, mat:white]\\6")
    assert len(pal) == 6


def test_image_palette(tmp_path):
    from PIL import Image

    img = Image.new("RGB", (8, 8), (255, 0, 0))
    p = tmp_path / "pal.png"
    img.save(p)
    pal = palette_from_string(f"@{p}")
    assert len(pal) == 1
    assert pal[0] == pytest.approx([1.0, 0.0, 0.0])


def test_act_palette(tmp_path):
    # minimal .act: 256 RGB triples + 4-byte footer (count=2, transparent idx)
    body = bytes([255, 0, 0, 0, 255, 0] + [0] * (768 - 6))
    footer = (2).to_bytes(2, "big") + (0).to_bytes(2, "big")
    p = tmp_path / "pal.act"
    p.write_bytes(body + footer)
    pal = palette_from_string(f"@{p}")
    assert len(pal) == 2
    assert pal[0] == pytest.approx([1.0, 0.0, 0.0])
    assert pal[1] == pytest.approx([0.0, 1.0, 0.0])
