"""Static-geometry differentiable cell renderer (the pixel drawer's engine).

The reference rasterizes its fixed polygon grid with diffvg's C++/CUDA renderer
every step (/root/reference/pixeldrawer.py:330-342, 2x2 supersampling).  Since the
geometry never changes — only the per-cell RGBA fills train — the TPU-native
design precomputes, once at init on the host:

    for every 2x2-supersampled output position: the (up to DEPTH) cell indices
    covering it, in painter order (last-drawn first),

and the per-step render becomes a pure gather + back-to-front alpha composite —
one memory-bound fused op with exact gradients to the colors, no rasterization
kernel in the hot loop at all.
"""

from __future__ import annotations

import numpy as np

DEPTH = 4  # max overlapping cells per subsample (knit/diamond overlap ≤ 3)
SS = 2  # supersampling factor (matches diffvg render args (2,2))


def _points_in_polygon(pts, poly):
    """Even-odd rule point-in-polygon test. pts (M, 2), poly (V, 2) → (M,) bool."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), dtype=bool)
    v = np.asarray(poly)
    n = len(v)
    j = n - 1
    for i in range(n):
        xi, yi = v[i]
        xj, yj = v[j]
        crosses = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / (yj - yi + 1e-12) + xi
        )
        inside ^= crosses
        j = i
    return inside


_native_lib = None
_native_checked = False


def _load_native():
    """ctypes binding to the C++ rasterizer (native/librasterizer.so); builds it
    on first use when g++ is available.  Returns None when unavailable."""
    global _native_lib, _native_checked
    if _native_checked:
        return _native_lib
    _native_checked = True
    import ctypes
    import os
    import subprocess

    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
    )
    so_path = os.path.join(native_dir, "librasterizer.so")
    if not os.path.exists(so_path) and os.path.exists(os.path.join(native_dir, "Makefile")):
        try:
            subprocess.run(["make", "-C", native_dir], check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(so_path):
        return None
    lib = ctypes.CDLL(so_path)
    lib.build_coverage_map.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _native_lib = lib
    return lib


def _build_coverage_map_native(polygons, canvas_width, canvas_height, lib):
    import ctypes

    hs, ws = canvas_height * SS, canvas_width * SS
    vertices = np.concatenate([np.asarray(p, np.float64).reshape(-1, 2) for p in polygons])
    offsets = np.zeros(len(polygons) + 1, np.int64)
    np.cumsum([len(p) for p in polygons], out=offsets[1:])
    indices = np.zeros((hs, ws, DEPTH), np.int32)
    counts = np.zeros((hs, ws), np.int32)
    lib.build_coverage_map(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(polygons), canvas_width, canvas_height, SS, DEPTH,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    valid = np.arange(DEPTH)[None, None, :] < np.minimum(counts, DEPTH)[..., None]
    return indices, valid


def _trim_depth(indices, valid):
    """Drop depth slots no subsample uses.

    The geometry is static, so the EFFECTIVE max overlap is known at build
    time: the pixel drawer's rectangle grid never overlaps (depth 1), knit and
    diamond overlap at seams (2-3).  Trimming shrinks the per-step render
    gather and composite loop by the same factor — 4x for the flagship grid.
    """
    used = valid.reshape(-1, valid.shape[-1]).any(axis=0)
    eff = max(int(used.sum()), 1)
    return indices[..., :eff], valid[..., :eff]


def build_coverage_map(polygons, canvas_width: int, canvas_height: int):
    """Precompute the supersampled painter-order coverage map.

    polygons: list of (V, 2) float arrays in canvas pixel coordinates, painter
    (draw) order.  Returns (indices, valid): both (H*SS, W*SS, depth_eff)
    int32/bool, where indices[..., 0] is the TOPMOST covering cell and
    depth_eff <= DEPTH is the trimmed effective overlap.  Uses the native C++
    rasterizer when available (same algorithm; see native/rasterizer.cpp).
    """
    lib = _load_native()
    if lib is not None:
        return _trim_depth(*_build_coverage_map_native(polygons, canvas_width, canvas_height, lib))
    hs, ws = canvas_height * SS, canvas_width * SS
    # subsample positions at pixel-interior offsets (0.25, 0.75 for SS=2)
    offs = (np.arange(SS) + 0.5) / SS
    ys = (np.arange(canvas_height)[:, None] + offs[None, :]).reshape(-1)  # (hs,)
    xs = (np.arange(canvas_width)[:, None] + offs[None, :]).reshape(-1)  # (ws,)

    indices = np.full((hs, ws, DEPTH), 0, dtype=np.int32)
    counts = np.zeros((hs, ws), dtype=np.int32)

    for cell_idx, poly in enumerate(polygons):
        poly = np.asarray(poly, dtype=np.float64)
        x0 = max(int(np.floor(poly[:, 0].min() * SS)), 0)
        x1 = min(int(np.ceil(poly[:, 0].max() * SS)) + 1, ws)
        y0 = max(int(np.floor(poly[:, 1].min() * SS)), 0)
        y1 = min(int(np.ceil(poly[:, 1].max() * SS)) + 1, hs)
        if x0 >= x1 or y0 >= y1:
            continue
        gx, gy = np.meshgrid(xs[x0:x1], ys[y0:y1])
        pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
        inside = _points_in_polygon(pts, poly).reshape(y1 - y0, x1 - x0)

        sub_idx = indices[y0:y1, x0:x1]
        # push-front: newest (topmost) shape goes to slot 0; shapes deeper than
        # DEPTH fall off the bottom (correct for limited-depth painter stacks)
        for d in range(DEPTH - 1, 0, -1):
            sub_idx[..., d] = np.where(inside, sub_idx[..., d - 1], sub_idx[..., d])
        sub_idx[..., 0] = np.where(inside, cell_idx, sub_idx[..., 0])
        counts[y0:y1, x0:x1] += inside

    valid_depth = np.arange(DEPTH)[None, None, :] < np.minimum(counts, DEPTH)[..., None]
    return _trim_depth(indices, valid_depth)


def try_separable_operators(indices, valid, num_rows: int, num_cols: int):
    """Factorize a depth-1, fully-covered coverage map into row/col operators.

    For the plain rectangle grid, the covering cell id at supersample
    (ys, xs) factorizes as ``row_id[ys] * num_cols + col_id[xs]``.  When it
    does (and every subsample is covered by exactly one cell), the whole
    render — gather → premultiplied alpha-over on transparent black → SS box
    filter — reassociates EXACTLY into two tiny MXU matmuls
    ``R_eff @ premul(colors) @ C_eff`` with a native linear adjoint: no
    gathers in the hot loop at all (the slot-gather backward costs ~2 ms/step
    at the 432x768 flagship canvas).  Returns (R_eff (H, num_rows),
    C_eff (num_cols, W)) float32 with the 1/SS box weights folded in, or
    None when the map does not factorize (shifted/overlapping geometries).
    """
    indices = np.asarray(indices)
    valid = np.asarray(valid)
    if indices.shape[-1] != 1 or not bool(valid.all()):
        return None
    idx = indices[..., 0]
    row_id = idx[:, 0] // num_cols
    col_id = idx[0, :] % num_cols
    if not np.array_equal(row_id[:, None] * num_cols + col_id[None, :], idx):
        return None
    hs, ws = idx.shape
    height, width = hs // SS, ws // SS
    r_op = np.zeros((height, num_rows), np.float32)
    np.add.at(r_op, (np.repeat(np.arange(height), SS), row_id), 1.0 / SS)
    c_op = np.zeros((num_cols, width), np.float32)
    np.add.at(c_op, (col_id, np.repeat(np.arange(width), SS)), 1.0 / SS)
    return r_op, c_op


def composite_cells_separable(colors, r_op, c_op, num_rows: int, num_cols: int):
    """Depth-1 full-coverage render as two matmuls (try_separable_operators).

    Same math as composite_cells for that case: out = a*c premultiplied over
    transparent black, SS-box-filtered — with the subsample sum reassociated
    into separable fractional-coverage weights.  HIGHEST precision keeps the
    tiny (H x rows x cols x W) contractions effectively exact in f32."""
    import jax
    import jax.numpy as jnp

    a = colors[:, 3:4]
    prem = jnp.concatenate([colors[:, :3] * a, a], axis=1)  # (cells, 4) premul
    p = prem.reshape(num_rows, num_cols * 4)
    t = jnp.dot(r_op, p, precision=jax.lax.Precision.HIGHEST)
    t = t.reshape(-1, num_cols, 4)
    return jnp.einsum("hck,cw->hwk", t, c_op, precision=jax.lax.Precision.HIGHEST)


def build_inverse_map(indices, valid, num_cells: int):
    """Static inverse of the coverage map for a scatter-free backward pass.

    Returns (cell_slots, cell_slot_valid): for each cell, the flat indices of the
    (subsample, depth) slots it occupies, padded to the max occupancy.  Because
    the geometry never changes, the adjoint of ``colors[indices]`` becomes a
    GATHER of the incoming cotangent at these precomputed slots (TPU scatters are
    the slowest primitive; this removes the last one from the pixel drawer).
    """
    flat_idx = indices.reshape(-1)
    flat_valid = valid.reshape(-1)
    slot_ids = np.arange(flat_idx.size, dtype=np.int64)

    # sort slots by cell id (invalid slots pushed to a sentinel bucket)
    keyed = np.where(flat_valid, flat_idx, num_cells)
    order = np.argsort(keyed, kind="stable")
    sorted_cells = keyed[order]
    sorted_slots = slot_ids[order]

    counts = np.bincount(sorted_cells, minlength=num_cells + 1)[:num_cells]
    max_occ = int(counts.max()) if counts.size else 1
    starts = np.zeros(num_cells, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])

    cell_slots = np.zeros((num_cells, max_occ), dtype=np.int32)
    cell_valid = np.arange(max_occ)[None, :] < counts[:, None]
    for_cell = np.repeat(np.arange(num_cells), counts)
    pos_in_cell = np.arange(for_cell.size) - np.repeat(starts, counts)
    cell_slots[for_cell, pos_in_cell] = sorted_slots[: for_cell.size]
    return cell_slots, cell_valid


def _take_cells_fwd(colors, args):
    return _take_cells(colors, args), args


def _take_cells_bwd(res, g):
    import jax.numpy as jnp

    _indices, cell_slots, cell_valid = res
    c = g.shape[-1]
    flat_g = g.reshape(-1, c)  # one row per (subsample, depth) slot
    per_cell = flat_g[cell_slots]  # (num_cells, max_occ, C) — gather, no scatter
    per_cell = jnp.where(cell_valid[..., None], per_cell, 0.0)
    return jnp.sum(per_cell, axis=1), None


def _take_cells_impl(colors, args):
    indices, _slots, _valid = args
    return colors[indices]


try:  # define as custom_vjp once
    import jax as _jax

    _take_cells = _jax.custom_vjp(_take_cells_impl)
    _take_cells.defvjp(_take_cells_fwd, _take_cells_bwd)
except ImportError:  # pragma: no cover
    _take_cells = _take_cells_impl


def composite_cells(colors, indices, valid, canvas_height: int, canvas_width: int,
                    inverse_map=None):
    """Differentiable render: per-cell RGBA → (H, W, 4) canvas.

    colors: (num_cells, 4) in [0,1]; indices/valid from build_coverage_map.
    Back-to-front 'over' compositing per subsample, then box-filter downsample.
    When ``inverse_map`` (from build_inverse_map) is given, the color-gather's
    backward pass is a precomputed gather instead of a TPU scatter.
    """
    import jax.numpy as jnp

    if inverse_map is not None:
        cell_slots, cell_valid = inverse_map
        gathered = _take_cells(colors, (indices, cell_slots, cell_valid))
    else:
        gathered = colors[indices]  # (hs, ws, DEPTH, 4)
    valid = valid[..., None]

    rgb = jnp.zeros(gathered.shape[:2] + (3,), dtype=colors.dtype)
    alpha = jnp.zeros(gathered.shape[:2] + (1,), dtype=colors.dtype)
    # iterate deepest → topmost (slot 0 is topmost) over the TRIMMED depth
    for d in range(gathered.shape[2] - 1, -1, -1):
        layer = gathered[:, :, d, :]
        a = jnp.where(valid[:, :, d, :], layer[..., 3:4], 0.0)
        c = layer[..., :3]
        rgb = a * c + (1.0 - a) * rgb
        alpha = a + (1.0 - a) * alpha

    out = jnp.concatenate([rgb, alpha], axis=-1)
    hs, ws = out.shape[0], out.shape[1]
    out = out.reshape(canvas_height, SS, canvas_width, SS, 4).mean(axis=(1, 3))
    return out
