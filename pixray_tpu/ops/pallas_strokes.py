"""Pallas TPU kernels: fused Bézier-stroke rasterization (clipdraw / line).

The XLA path (ops/strokes.py) materializes a (segments, H, W) distance field
per stroke in HBM and composites chunk layers through a lax.scan — at 1024
strokes that is ~79 ms/step of mostly memory traffic and scan latency on v5e.
These kernels keep everything in VMEM: the canvas is tiled over the grid's two
leading dimensions, strokes stream through the trailing (sequential) dimension
in SMEM chunks, and each (tile, stroke) pair computes its running-min segment
distance, anti-aliased coverage, and premultiplied 'over' composite in
registers — zero HBM transients.  A per-stroke bounding-box test skips the
vector work for the (tile, stroke) pairs the stroke cannot touch (most of
them: clipdraw strokes are small).

Backward design (chunk-granular checkpointing):
- the forward-for-vjp stores the canvas at each chunk's ENTRY (prefix states,
  n_chunks×4×H×W in HBM — ~85 MB at the clipdraw flagship, ~0.2 ms of traffic);
- the backward kernel walks chunks TOP→BOTTOM per tile, carrying the suffix
  transmittance S = Π(1-a) in VMEM scratch (the 'over' Jacobian wrt its bottom
  operand is (1-a_top) for all four premultiplied channels), and recomputes the
  within-chunk prefix canvases ascending from the stored chunk entry;
- per-segment endpoint gradients use the envelope form (the projection
  parameter minimizes the distance, so its derivative drops out up to the
  1e-8 eps): dd2/da = -2e(1-t), dd2/db = -2e·t.  Ties in the segment min
  split evenly — the convention of lax.reduce_min's chooser JVP rule, so
  gradients match the XLA path.  Per-segment pixel sums reduce the trailing
  axes of (n_segs, th, tw) arrays: one reduction per field, not per segment.

Semantics match ops/strokes.py::render_strokes exactly (same eps constants,
same 1-px linear AA ramp, 'over' in premultiplied alpha, painter order =
stroke order; 'over' is associative so the XLA path's pairwise chunk reduction
and this kernel's strictly sequential compositing agree up to float
reassociation).  Reference behavior: diffvg's prefiltered path rendering used
by /root/reference/clipdrawer.py:128-138 and linedrawer.py:156-170.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# strokes per grid step (amortizes Mosaic per-step overhead); canvas tile size
S_CHUNK = int(os.environ.get("PIXRAY_TPU_STROKE_CHUNK", "16"))
TILE_H = int(os.environ.get("PIXRAY_TPU_STROKE_TILE_H", "32"))
TILE_W = int(os.environ.get("PIXRAY_TPU_STROKE_TILE_W", "128"))

# meta row layout (per stroke): [width, r, g, b, a, bx0, by0, bx1, by1]
META_W = 9


def _seg_dist2(px, py, ax, ay, bx, by):
    """Squared distance from the pixel tile to one segment (scalar endpoints).

    Same formula and eps as strokes._point_segment_dist2."""
    abx, aby = bx - ax, by - ay
    ab2 = abx * abx + aby * aby + 1e-8
    t = ((px - ax) * abx + (py - ay) * aby) / ab2
    t = jnp.clip(t, 0.0, 1.0)
    cx = ax + t * abx
    cy = ay + t * aby
    return (px - cx) ** 2 + (py - cy) ** 2


def _tile_coords(th, tw):
    """Pixel-center coordinates of canvas tile (program_id 0, 1)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ys = (ti * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)).astype(
        jnp.float32
    ) + 0.5
    xs = (tj * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(
        jnp.float32
    ) + 0.5
    return xs, ys


def _stroke_cov(samples_ref, meta_ref, s, px, py, n_segs):
    """Running-min distance over the stroke's segments → AA coverage (th, tw)."""
    d2min = None
    for j in range(n_segs):
        d2 = _seg_dist2(
            px, py,
            samples_ref[s, j, 0], samples_ref[s, j, 1],
            samples_ref[s, j + 1, 0], samples_ref[s, j + 1, 1],
        )
        d2min = d2 if d2min is None else jnp.minimum(d2min, d2)
    dist = jnp.sqrt(d2min + 1e-12)
    return jnp.clip(meta_ref[s, 0] / 2.0 + 0.5 - dist, 0.0, 1.0)


def _bbox_hit(meta_ref, s, th, tw):
    """Does stroke s's (pre-margined) bbox intersect this canvas tile?"""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tx0 = (tj * tw).astype(jnp.float32)
    ty0 = (ti * th).astype(jnp.float32)
    return jnp.logical_and(
        jnp.logical_and(meta_ref[s, 5] <= tx0 + tw, meta_ref[s, 7] >= tx0),
        jnp.logical_and(meta_ref[s, 6] <= ty0 + th, meta_ref[s, 8] >= ty0),
    )


def _paint_stroke(meta_ref, samples_ref, out_ref, s, px, py, n_segs):
    a = _stroke_cov(samples_ref, meta_ref, s, px, py, n_segs) * meta_ref[s, 4]
    one_m = 1.0 - a
    out_ref[0, :, :] = meta_ref[s, 1] * a + one_m * out_ref[0, :, :]
    out_ref[1, :, :] = meta_ref[s, 2] * a + one_m * out_ref[1, :, :]
    out_ref[2, :, :] = meta_ref[s, 3] * a + one_m * out_ref[2, :, :]
    out_ref[3, :, :] = a + one_m * out_ref[3, :, :]


def _fwd_kernel(meta_ref, samples_ref, bg_ref, out_ref, *, n_segs, chunk, th, tw):
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        out_ref[...] = bg_ref[...]

    px, py = _tile_coords(th, tw)
    for s in range(chunk):
        hit = jnp.logical_and(_bbox_hit(meta_ref, s, th, tw), meta_ref[s, 4] > 0.0)

        @pl.when(hit)
        def _paint(s=s):
            _paint_stroke(meta_ref, samples_ref, out_ref, s, px, py, n_segs)


def _fwd_store_kernel(meta_ref, samples_ref, bg_ref, out_ref, prefix_ref, *,
                      n_segs, chunk, th, tw):
    """Forward that ALSO stores the canvas at each chunk's entry."""
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        out_ref[...] = bg_ref[...]

    prefix_ref[0] = out_ref[...]
    px, py = _tile_coords(th, tw)
    for s in range(chunk):
        hit = jnp.logical_and(_bbox_hit(meta_ref, s, th, tw), meta_ref[s, 4] > 0.0)

        @pl.when(hit)
        def _paint(s=s):
            _paint_stroke(meta_ref, samples_ref, out_ref, s, px, py, n_segs)


def _bwd_kernel(meta_ref, samples_ref, prefix_ref, g_ref,
                dsam_ref, dmeta_ref, dbg_ref,
                a_scr, s_scr, suffix_scr, canvas_scr, *,
                n_segs, chunk, th, tw, n_chunks, h, w):
    """One (tile, chunk) backward step; the chunk grid dimension iterates
    TOP→BOTTOM (index maps reverse it).  See module docstring for the math.

    Remainder tiles carry UNDEFINED data in their padding rows/cols (g and
    prefix blocks) — every reduction masks to the valid canvas region, and
    values derived from padded loads are where-selected to 0 before use."""
    ci = pl.program_id(2)  # 0 = TOP chunk

    @pl.when(ci == 0)
    def _init_suffix():
        suffix_scr[...] = jnp.ones((th, tw), jnp.float32)

    px, py = _tile_coords(th, tw)
    dsam_ref[...] = jnp.zeros_like(dsam_ref)
    dmeta_ref[...] = jnp.zeros_like(dmeta_ref)

    hits = []
    # pass A (ascending): per-stroke alpha maps a_s
    for s in range(chunk):
        hit = jnp.logical_and(_bbox_hit(meta_ref, s, th, tw), meta_ref[s, 4] > 0.0)
        hits.append(hit)
        a_scr[s] = jnp.zeros((th, tw), jnp.float32)

        @pl.when(hit)
        def _a(s=s):
            a_scr[s] = (
                _stroke_cov(samples_ref, meta_ref, s, px, py, n_segs)
                * meta_ref[s, 4]
            )

    # pass B (descending): per-stroke suffix transmittance S_s
    s_scr[chunk - 1] = suffix_scr[...]
    for s in range(chunk - 2, -1, -1):
        s_scr[s] = s_scr[s + 1] * (1.0 - a_scr[s + 1])
    suffix_scr[...] = s_scr[0] * (1.0 - a_scr[0])

    # pass C (ascending): cotangents, with C = canvas below the stroke
    canvas_scr[...] = prefix_ref[0]
    for s in range(chunk):
        @pl.when(hits[s])
        def _grad(s=s):
            width = meta_ref[s, 0]
            col = (meta_ref[s, 1], meta_ref[s, 2], meta_ref[s, 3])
            alpha = meta_ref[s, 4]

            # per-segment math runs with SCALAR endpoints (like the forward):
            # Mosaic rejects both the (n_segs,)->(n_segs,1,1) shape cast and
            # the (n_segs,th,tw) -> (n_segs,) axis-(1,2) reduction layout, so
            # the segment axis is an unrolled Python loop and every reduction
            # lands on a scalar.
            def seg_geom(j):
                ax = samples_ref[s, j, 0]
                ay = samples_ref[s, j, 1]
                bx = samples_ref[s, j + 1, 0]
                by = samples_ref[s, j + 1, 1]
                abx, aby = bx - ax, by - ay
                ab2 = abx * abx + aby * aby + 1e-8
                t = jnp.clip(((px - ax) * abx + (py - ay) * aby) / ab2, 0.0, 1.0)
                ex = px - (ax + t * abx)  # (th, tw)
                ey = py - (ay + t * aby)
                return t, ex, ey

            d2s = []
            for j in range(n_segs):
                t, ex, ey = seg_geom(j)
                d2s.append(ex * ex + ey * ey)
            d2min = d2s[0]
            for j in range(1, n_segs):
                d2min = jnp.minimum(d2min, d2s[j])
            tie_sum = (d2s[0] == d2min).astype(jnp.float32)
            for j in range(1, n_segs):
                tie_sum += (d2s[j] == d2min).astype(jnp.float32)
            dist = jnp.sqrt(d2min + 1e-12)
            cov = jnp.clip(width / 2.0 + 0.5 - dist, 0.0, 1.0)
            ramp = jnp.logical_and(cov > 0.0, cov < 1.0).astype(jnp.float32)
            a = cov * alpha

            valid = jnp.logical_and(px < float(w), py < float(h))
            mask = lambda v: jnp.where(valid, v, 0.0)
            u0 = mask(g_ref[0]) * s_scr[s]
            u1 = mask(g_ref[1]) * s_scr[s]
            u2 = mask(g_ref[2]) * s_scr[s]
            u3 = mask(g_ref[3]) * s_scr[s]
            da = mask(
                u0 * (col[0] - canvas_scr[0])
                + u1 * (col[1] - canvas_scr[1])
                + u2 * (col[2] - canvas_scr[2])
                + u3 * (1.0 - canvas_scr[3])
            )
            dcov = da * alpha
            ddist = -dcov * ramp
            # meta row: [dwidth, dr, dg, db, dalpha, 0, 0, 0, 0]
            dmeta_ref[0, 0, s, :] = jnp.stack([
                0.5 * jnp.sum(-ddist),
                jnp.sum(u0 * a),
                jnp.sum(u1 * a),
                jnp.sum(u2 * a),
                jnp.sum(da * cov),
                jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
            ])
            base = ddist / (2.0 * dist)  # (th, tw)
            # polyline point j = segment j's a-end + segment j-1's b-end;
            # point gradients accumulate as scalars and store as ONE stacked
            # row per coordinate (scalar stores to VMEM are unsupported)
            gx, gy = [], []
            prev_gbx = prev_gby = 0.0
            for j in range(n_segs):
                t, ex, ey = seg_geom(j)
                dd2 = base * ((d2s[j] == d2min).astype(jnp.float32) / tie_sum)
                gx.append(jnp.sum(dd2 * (-2.0 * ex) * (1.0 - t)) + prev_gbx)
                gy.append(jnp.sum(dd2 * (-2.0 * ey) * (1.0 - t)) + prev_gby)
                prev_gbx = jnp.sum(dd2 * (-2.0 * ex) * t)
                prev_gby = jnp.sum(dd2 * (-2.0 * ey) * t)
            gx.append(prev_gbx)
            gy.append(prev_gby)
            dsam_ref[0, 0, s, 0, :] = jnp.stack(gx)
            dsam_ref[0, 0, s, 1, :] = jnp.stack(gy)

            # advance the below-canvas to include this stroke
            one_m = 1.0 - a
            canvas_scr[0] = col[0] * a + one_m * canvas_scr[0]
            canvas_scr[1] = col[1] * a + one_m * canvas_scr[1]
            canvas_scr[2] = col[2] * a + one_m * canvas_scr[2]
            canvas_scr[3] = a + one_m * canvas_scr[3]

    # after the BOTTOM chunk (last grid step for this tile), suffix_scr is the
    # total stroke transmittance: cotangent of the premultiplied background
    @pl.when(ci == n_chunks - 1)
    def _dbg():
        for c in range(4):
            dbg_ref[c] = g_ref[c] * suffix_scr[...]


def _pack_meta(samples, widths, colors):
    """(N, META_W): per-stroke scalars + AA-margined bbox for the tile test."""
    margin = widths[:, None] / 2.0 + 1.0  # ramp reaches width/2 + 0.5; +slack
    mn = jnp.min(samples, axis=1)  # (N, 2) [x, y]
    mx = jnp.max(samples, axis=1)
    return jnp.concatenate(
        [widths[:, None], colors, mn - margin, mx + margin], axis=-1
    ).astype(jnp.float32)


def _pad_strokes(samples, widths, colors, chunk):
    n, p, _ = samples.shape
    pad_n = (-n) % chunk
    if pad_n:
        samples = jnp.concatenate(
            [samples, jnp.zeros((pad_n, p, 2), samples.dtype)], 0
        )
        widths = jnp.concatenate([widths, jnp.zeros((pad_n,), widths.dtype)], 0)
        colors = jnp.concatenate([colors, jnp.zeros((pad_n, 4), colors.dtype)], 0)
    return samples, widths, colors, n + pad_n


def _run_fwd(samples, widths, colors, bg_premult, interpret, chunk, th, tw,
             store_prefixes: bool):
    n_orig, p, _ = samples.shape
    n_segs = p - 1
    _, h, w = bg_premult.shape
    samples, widths, colors, n = _pad_strokes(samples, widths, colors, chunk)
    meta = _pack_meta(samples, widths, colors)
    n_chunks = n // chunk
    grid = (pl.cdiv(h, th), pl.cdiv(w, tw), n_chunks)
    in_specs = [
        pl.BlockSpec((chunk, META_W), lambda i, j, c: (c, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((chunk, p, 2), lambda i, j, c: (c, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((4, th, tw), lambda i, j, c: (0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    canvas_spec = pl.BlockSpec((4, th, tw), lambda i, j, c: (0, i, j),
                               memory_space=pltpu.VMEM)
    args = (meta, samples.astype(jnp.float32), bg_premult.astype(jnp.float32))
    if not store_prefixes:
        kernel = functools.partial(
            _fwd_kernel, n_segs=n_segs, chunk=chunk, th=th, tw=tw
        )
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=canvas_spec,
            out_shape=jax.ShapeDtypeStruct((4, h, w), jnp.float32),
            interpret=interpret,
        )(*args)
    kernel = functools.partial(
        _fwd_store_kernel, n_segs=n_segs, chunk=chunk, th=th, tw=tw
    )
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=[
            canvas_spec,
            pl.BlockSpec((1, 4, th, tw), lambda i, j, c: (c, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 4, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


def _run_bwd(g, samples, widths, colors, prefixes, interpret, chunk, th, tw):
    n_orig, p, _ = samples.shape
    n_segs = p - 1
    _, h, w = prefixes.shape[1:]
    samples, widths, colors, n = _pad_strokes(samples, widths, colors, chunk)
    meta = _pack_meta(samples, widths, colors)
    n_chunks = n // chunk
    n_ti, n_tj = pl.cdiv(h, th), pl.cdiv(w, tw)
    grid = (n_ti, n_tj, n_chunks)
    rev = lambda c: n_chunks - 1 - c
    kernel = functools.partial(
        _bwd_kernel, n_segs=n_segs, chunk=chunk, th=th, tw=tw, n_chunks=n_chunks,
        h=h, w=w,
    )
    dsam_part, dmeta_part, dbg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, META_W), lambda i, j, c: (rev(c), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, p, 2), lambda i, j, c: (rev(c), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, th, tw), lambda i, j, c: (rev(c), 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tw), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, chunk, 2, p), lambda i, j, c: (i, j, rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, META_W), lambda i, j, c: (i, j, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tw), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ti, n_tj, n, 2, p), jnp.float32),
            jax.ShapeDtypeStruct((n_ti, n_tj, n, META_W), jnp.float32),
            jax.ShapeDtypeStruct((4, h, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk, th, tw), jnp.float32),
            pltpu.VMEM((chunk, th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((4, th, tw), jnp.float32),
        ],
        interpret=interpret,
    )(meta, samples.astype(jnp.float32), prefixes, g.astype(jnp.float32))
    dsam = jnp.sum(dsam_part, axis=(0, 1))[:n_orig]  # (N, 2, P)
    dmeta = jnp.sum(dmeta_part, axis=(0, 1))[:n_orig]  # (N, META_W)
    dsamples = dsam.transpose(0, 2, 1)  # (N, P, 2)
    dwidths = dmeta[:, 0]
    dcolors = dmeta[:, 1:5]
    return dsamples, dwidths, dcolors, dbg


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _render_premult(samples, widths, colors, bg_premult, interpret, chunk, th, tw):
    """(N,P,2), (N,), (N,4), (4,H,W) premult → (4,H,W) premult canvas."""
    return _run_fwd(samples, widths, colors, bg_premult, interpret, chunk, th, tw,
                    store_prefixes=False)


def _render_premult_fwd(samples, widths, colors, bg_premult, interpret, chunk,
                        th, tw):
    canvas, prefixes = _run_fwd(
        samples, widths, colors, bg_premult, interpret, chunk, th, tw,
        store_prefixes=True,
    )
    return canvas, (samples, widths, colors, prefixes)


def _render_premult_bwd(interpret, chunk, th, tw, res, g):
    samples, widths, colors, prefixes = res
    dsamples, dwidths, dcolors, dbg = _run_bwd(
        g, samples, widths, colors, prefixes, interpret, chunk, th, tw
    )
    return (
        dsamples.astype(samples.dtype),
        dwidths.astype(widths.dtype),
        dcolors.astype(colors.dtype),
        dbg,
    )


_render_premult.defvjp(_render_premult_fwd, _render_premult_bwd)


def render_strokes_fused(points, widths, colors, basis, h: int, w: int,
                         background, interpret: bool = False,
                         chunk: int | None = None, tile_h: int | None = None,
                         tile_w: int | None = None):
    """Drop-in for strokes.render_strokes using the fused Pallas kernels.

    points: (N, V, 2) control points; widths (N,); colors (N, 4) straight RGBA;
    basis (N, P, V); background (H, W, 4) straight or (H, W, 3).
    Returns (H, W, 4) straight-alpha canvas.  Differentiable in points, widths,
    colors, and background."""
    chunk = S_CHUNK if chunk is None else chunk
    th = TILE_H if tile_h is None else tile_h
    tw = TILE_W if tile_w is None else tile_w
    samples = jnp.einsum("npv,nvd->npd", basis, points)  # (N, P, 2)
    if background.shape[-1] == 3:
        background = jnp.concatenate(
            [background, jnp.ones(background.shape[:2] + (1,), background.dtype)],
            axis=-1,
        )
    bg_premult = jnp.concatenate(
        [background[..., :3] * background[..., 3:4], background[..., 3:4]], axis=-1
    ).transpose(2, 0, 1)  # (4, H, W)
    canvas = _render_premult(
        samples.astype(jnp.float32), widths.astype(jnp.float32),
        colors.astype(jnp.float32), bg_premult.astype(jnp.float32),
        interpret, chunk, th, tw,
    )
    canvas = canvas.transpose(1, 2, 0)  # (H, W, 4) premultiplied
    alpha = canvas[..., 3:4]
    rgb = canvas[..., :3] / jnp.maximum(alpha, 1e-6)
    return jnp.concatenate([rgb, alpha], axis=-1)
