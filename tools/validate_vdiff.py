"""v-diffusion checkpoint audit harness (runs when a .pth asset is present).

The reference consumes the pixray fork of v-diffusion-pytorch through a 3-call
sampler API (/root/reference/vdiff.py:117-160); the submodule itself is not
vendored.  models/vdiff_upstream.py re-implements the PUBLISHED upstream module
tree (spec-driven, golden-tested vs a torch mirror at tiny scale in
tests/test_vdiff_golden.py) and ships a ready converter
(convert_vdiff_state_dict).  This tool closes the remaining loop — real-weight
fidelity — the moment a checkpoint is obtainable:

1. loads ``models/<name>.pth`` (torch state dict),
2. reconstructs the upstream module tree from the state-dict key nesting
   (``net.3.main.2.weight`` ⇒ Sequential index path) and prints it with shapes,
3. diffs the parameter-count and layer-shape signature against our
   ``VDiffUNet`` for the same config, reporting exactly where the layer map
   diverges,
4. writes VDIFF_AUDIT.json for the conversion work.

Usage: python tools/validate_vdiff.py [--model cc12m_1] [--report PATH]
Exit 0 when nothing to audit (no checkpoint) or audit written; the audit itself
is informational — it drives the converter, it is not a pass/fail gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_from_keys(sd):
    """Reconstruct the nested module tree from state-dict key paths."""
    tree: dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = tuple(v.shape)
    return tree


def print_tree(node, prefix="", lines=None):
    lines = lines if lines is not None else []
    for k, v in node.items():
        if isinstance(v, dict):
            lines.append(f"{prefix}{k}/")
            print_tree(v, prefix + "  ", lines)
        else:
            lines.append(f"{prefix}{k}: {list(v)}")
    return lines


def shape_signature(shapes):
    """Multiset of parameter shapes — order-independent layer-map fingerprint."""
    sig = defaultdict(int)
    for s in shapes:
        sig[tuple(sorted(s, reverse=True))] += 1
    return dict(sorted(sig.items(), key=lambda kv: (-np.prod(kv[0]), kv[0])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cc12m_1")
    ap.add_argument("--report", default="VDIFF_AUDIT.json")
    args = ap.parse_args()

    ckpt = os.path.join(
        os.environ.get("PIXRAY_TPU_MODELS", "models"), f"{args.model}.pth"
    )
    if not os.path.exists(ckpt):
        print(f"[skip] no checkpoint at {ckpt} — nothing to audit")
        sys.exit(0)

    import torch

    sd = torch.load(ckpt, map_location="cpu")
    sd = sd.get("state_dict", sd)
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}

    os.environ["PIXRAY_TPU_NO_DOWNLOAD"] = "1"
    from pixray_tpu.models.vdiff_upstream import (
        UPSTREAM_SPECS,
        convert_vdiff_state_dict,
        expected_state_shapes,
    )

    spec = UPSTREAM_SPECS[args.model]
    expected = expected_state_shapes(spec)
    got = {k: tuple(v.shape) for k, v in sd.items()}

    # exact KEY-level diff against the spec signature — names AND shapes
    missing = {k: list(v) for k, v in expected.items() if k not in got}
    extra = {k: list(v) for k, v in got.items() if k not in expected}
    mismatched = {
        k: {"checkpoint": list(got[k]), "spec": list(expected[k])}
        for k in expected
        if k in got and got[k] != expected[k]
    }
    key_map_matches = not missing and not extra and not mismatched

    # order-independent shape-multiset fingerprint (coarser, survives renames)
    ours_sig = shape_signature(expected.values())
    theirs_sig = shape_signature(got.values())
    only_theirs = {
        str(k): v - ours_sig.get(k, 0)
        for k, v in theirs_sig.items()
        if v > ours_sig.get(k, 0)
    }
    only_ours = {
        str(k): v - theirs_sig.get(k, 0)
        for k, v in ours_sig.items()
        if v > theirs_sig.get(k, 0)
    }

    conversion_ok = False
    if key_map_matches:
        try:
            convert_vdiff_state_dict({k: np.asarray(v) for k, v in sd.items()}, spec)
            conversion_ok = True
        except Exception as e:  # pragma: no cover - depends on asset
            print(f"conversion failed: {e}")

    report = {
        "model": args.model,
        "checkpoint": ckpt,
        "upstream_params": int(sum(int(np.prod(s)) for s in got.values())),
        "ours_params": int(sum(int(np.prod(s)) for s in expected.values())),
        "upstream_tensors": len(got),
        "ours_tensors": len(expected),
        "missing_keys": missing,
        "extra_keys": extra,
        "mismatched_shapes": mismatched,
        "key_map_matches": key_map_matches,
        "conversion_ok": conversion_ok,
        "shapes_only_upstream": only_theirs,
        "shapes_only_ours": only_ours,
        "layer_map_matches": not only_theirs and not only_ours,
        "upstream_tree": print_tree(tree_from_keys(sd)),
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(
        f"upstream: {report['upstream_tensors']} tensors / "
        f"{report['upstream_params']/1e6:.1f}M params;  ours: "
        f"{report['ours_tensors']} tensors / {report['ours_params']/1e6:.1f}M params"
    )
    print(f"key map matches: {report['key_map_matches']}; "
          f"conversion ok: {report['conversion_ok']}; "
          f"shape fingerprint matches: {report['layer_map_matches']}")
    print(f"audit -> {args.report}")


if __name__ == "__main__":
    main()
