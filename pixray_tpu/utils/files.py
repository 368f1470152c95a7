"""File/path/unit utilities.

Capability parity with the reference utility layer (see /root/reference/util.py:25-71,
263-312): brace-expanded globs, validated output paths, argparse bools, the
``'50%'``/``'20 iterations'`` unit parser, pipe splitting, and ``%DATE%``/``%SEQ%``
filename templating.  Pure Python, CPU-only, fully unit-testable.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import itertools
import os
import re
from pathlib import Path


def brace_expand(pattern: str) -> list[str]:
    """Expand shell-style ``{a,b}`` alternations in a glob pattern.

    Self-contained replacement for the third-party ``braceexpand`` package used by the
    reference (util.py:5). Handles nesting; no numeric ranges (reference usage never
    relies on them).
    """
    start = pattern.find("{")
    if start < 0:
        return [pattern]
    # find the matching close brace and split its body on top-level commas
    depth = 0
    alts, buf = [], []
    for i in range(start, len(pattern)):
        c = pattern[i]
        if c == "{":
            depth += 1
            if depth == 1:
                continue
        elif c == "}":
            depth -= 1
            if depth == 0:
                alts.append("".join(buf))
                head, tail = pattern[:start], pattern[i + 1 :]
                out: list[str] = []
                for alt in alts:
                    out.extend(brace_expand(head + alt + tail))
                return out
        elif c == "," and depth == 1:
            alts.append("".join(buf))
            buf = []
            continue
        buf.append(c)
    return [pattern]  # unbalanced braces: treat literally


def real_glob(rglob: str) -> list[str]:
    """Brace-expanded glob returning a sorted file list (util.py:25-30 semantics)."""
    files = list(
        itertools.chain.from_iterable(glob.glob(g) for g in brace_expand(rglob))
    )
    return sorted(files)


def get_file_path(directory: str, filename: str | None, suffix: str) -> str:
    """Join directory+filename with a forced suffix, rejecting path-y filenames.

    Mirrors util.py:32-36: filenames containing slashes/backslashes or that are
    empty/None raise ValueError.
    """
    if filename is None or re.search(r"\\|/|^$", filename.strip()):
        raise ValueError("Invalid filename specified.")
    return str(Path(directory, filename).with_suffix(suffix))


def str2bool(v) -> bool:
    """argparse-friendly bool parser (util.py:39-47 semantics)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def parse_unit(value, total_iterations: int, argument_name: str, default_unit: str = "%"):
    """Parse ``'30'``/``'30i'``/``'10%'``-style values into an iteration count.

    Semantics match util.py:49-65 exactly (spec'd by the reference unit tests):
    bare numbers get ``default_unit``; percent values are scaled by
    ``total_iterations``; anything else raises ValueError.
    """
    if value is None:
        return None

    value = str(value).lower().strip()
    digits = re.search(r"^\d*[.]?\d+", value)

    if re.match(r"^\d*[.]?\d+$", value):
        value += default_unit

    if re.match(r"^\d*[.]?\d+[\s]*(i|iter|iterations)$", value):
        return int(float(digits.group(0)))
    if re.match(r"^\d*[.]?\d+[\s]*(p|%|percent)$", value):
        return int(float(digits.group(0)) * 0.01 * total_iterations)

    raise ValueError(
        f"Invalid value for {argument_name}, please use a digit-unit combination "
        "like '20 iterations' or '50%'."
    )


def split_pipes(attribute):
    """Split a ``|``-separated multi-prompt string (util.py:67-71 semantics)."""
    if not attribute:
        return attribute
    return [phrase.strip() for phrase in attribute.split("|")]


def emit_filename(filename: str, template_dict: dict | None = None) -> str:
    """Fill ``%DATE%``, ``%SEQ%`` and custom ``%KEY%`` placeholders in a filename.

    ``%SEQ%`` resolves to the first two-digit sequence number whose expansion does
    not already exist on disk (util.py:273-312 semantics, minus the legacy args path).
    """
    datestr = datetime.datetime.now().strftime("%Y%m%d")
    filename = filename.replace("%DATE%", datestr)

    for key, val in (template_dict or {}).items():
        filename = filename.replace(f"%{key}%", f"{val}")

    if "%SEQ%" in filename:
        cur_seq = 1
        candidate = filename.replace("%SEQ%", f"{cur_seq:02d}")
        while os.path.exists(candidate):
            cur_seq += 1
            candidate = filename.replace("%SEQ%", f"{cur_seq:02d}")
        filename = candidate
    return filename


def map_number(n, start1, stop1, start2, stop2):
    """Linear range remap (p5.js ``map``; util.py:76-77)."""
    return ((n - start1) / (stop1 - start1)) * (stop2 - start2) + start2
