"""Utility-layer tests; the parse_unit/get_file_path/split_pipes cases reproduce the
reference's test matrix (/root/reference/tests/test_util.py) as a behavioral spec."""

import pytest

from pixray_tpu.utils import (
    brace_expand,
    get_file_path,
    parse_unit,
    split_pipes,
)


class TestGetFilePath:
    def test_no_backslash(self):
        assert get_file_path("/testpath", "testfile", ".png") == "/testpath/testfile.png"

    def test_with_backslash(self):
        assert get_file_path("/testpath/", "testfile", ".png") == "/testpath/testfile.png"

    def test_filename_contains_backslash(self):
        with pytest.raises(ValueError):
            get_file_path("/testpath/", "\\test\\filename.png", ".png")

    def test_filename_contains_slash(self):
        with pytest.raises(ValueError):
            get_file_path("/testpath/", "/test/filename.png", ".png")

    def test_no_path(self):
        assert get_file_path("", "testfile", ".png") == "testfile.png"

    def test_none_filename_raises(self):
        with pytest.raises(ValueError):
            get_file_path("/testpath/", None, ".png")

    def test_empty_filename_raises(self):
        with pytest.raises(ValueError):
            get_file_path("/testpath/", " ", ".png")

    def test_replaces_suffix(self):
        assert get_file_path("/testpath", "testfile.png", ".mp4") == "/testpath/testfile.mp4"


class TestParseUnit:
    def test_valid_iterations(self):
        assert parse_unit("200iterations", 500, "overlay_until") == 200

    def test_valid_iterations_space(self):
        assert parse_unit("200 i", 500, "overlay_until") == 200

    def test_valid_percentage(self):
        assert parse_unit("50%", 500, "overlay_until") == 250

    def test_valid_percentage_space(self):
        assert parse_unit("33 percent", 500, "overlay_until") == 165

    def test_invalid(self):
        with pytest.raises(ValueError):
            parse_unit(" percent", 500, "overlay_until")

    def test_none(self):
        assert parse_unit(None, 500, "overlay_until") is None

    def test_robust_format(self):
        assert parse_unit("200 iterATions    ", 500, "overlay_until") == 200

    def test_default_percent(self):
        assert parse_unit("50", 500, "overlay_until") == 250

    def test_default_unit_arg(self):
        assert parse_unit("50", 500, "overlay_until", "i") == 50

    def test_plain_integer(self):
        assert parse_unit(50, 500, "overlay_until", "i") == 50

    def test_leading_decimal_iterations(self):
        assert parse_unit(0.6, 500, "overlay_until", "i") == 0

    def test_leading_decimal_percent(self):
        assert parse_unit(0.5, 500, "overlay_until", "p") == 2

    def test_trailing_decimal_invalid(self):
        with pytest.raises(ValueError):
            parse_unit("67.i", 500, "overlay_until")


class TestSplitPipes:
    def test_none(self):
        assert split_pipes(None) is None

    def test_with_pipe(self):
        assert split_pipes("test|another") == ["test", "another"]

    def test_empty(self):
        assert split_pipes("") == ""

    def test_single(self):
        assert split_pipes("single") == ["single"]


class TestBraceExpand:
    def test_plain(self):
        assert brace_expand("foo.png") == ["foo.png"]

    def test_alternation(self):
        assert brace_expand("a{b,c}d") == ["abd", "acd"]

    def test_nested(self):
        assert brace_expand("{a,b{c,d}}") == ["a", "bc", "bd"]
