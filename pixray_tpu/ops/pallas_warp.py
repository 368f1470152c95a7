"""Pallas TPU kernel: fused cutout warp (the north-star fused gather/resize op).

Both directions of the batched homography warp are expressed as VMEM-resident
MXU matmuls against bilinear hat weights that are BUILT INSIDE THE KERNEL — no
gathers, no scatters, and none of the (K×U)/(K×V)/(U×K×C) intermediates the XLA
einsum formulation writes to HBM (~15 GB/step of traffic at 64 cutouts):

  forward tile:   a = hat(sy)  (T×U);  tmp_c = a @ work_c (U×V);  out_c = Σ_v tmp_c ⊙ hat(sx)
  backward tile:  dwork_c += hat(sy)ᵀ @ (hat(sx) ⊙ g_c)

Grid = (cutouts, K-tiles of output pixels); the work canvas stays resident in
VMEM; dwork accumulates in a revisited output block.  Falls back transparently
to ops/warp_batch.py off-TPU (tests run the kernel in interpret mode).

Matmul precision is a per-call knob (measured on v5e, interleaved same-process
benchmark): "bf16" (hats+work quantized to bf16, f32 accumulate, single MXU
pass) is 3-4x faster than "highest" (exact f32) and its ~4e-3 output quantization
is far below the noise_fac=0.1 augmentation noise added to every cutout
downstream.  "highest" remains the numerics-reference mode (crosscheck tests,
CPU-parity audits).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixray_tpu.ops.warp import inv3x3
from pixray_tpu.ops.warp_batch import _source_coords

# defaults, overridable per call; env knobs kept for benchmarking sweeps
# (k_tile=1024 swept best on v5e for the flagship 224² bank: 52.9 vs 50.5
# steps/s against 256/512 at equal calib — fewer grid steps amortize the
# per-chunk hat construction better once the band plan caps VMEM)
K_TILE = int(os.environ.get("PIXRAY_TPU_WARP_KTILE", "1024"))
# flagship step cost on v5e by warp matmul mode: "bf16" 80 ms/step, "high"
# (error-compensated bf16, ~f32-exact) 132, exact-f32 "highest" 206.  bf16's
# ~1e-2 output quantization sits far below the noise_fac=0.1 augmentation noise
# every cutout receives downstream, so the fast mode is the default.
# default "int8": the transposed multi FORWARD runs its hat-y contraction on
# the int8 MXU path (~1.3x bf16 on v5e; quantization error ~1% of canvas
# range, an order below the engine's noise_fac=0.1 forward noise); every
# other kernel — all backwards included — runs bf16 (_norm_prec).  Set
# PIXRAY_TPU_WARP_PREC=bf16 for the round-2 numerics, =highest for the
# exact audit mode (see README).
WARP_PREC = os.environ.get("PIXRAY_TPU_WARP_PREC", "int8")
# adaptive row-band height for the hat matmuls (0 disables — the measured
# default): banding cuts the contraction from H to `band` rows with an exact
# corner-bounded span test, but on v5e the pl.when + dynamic-slice machinery
# costs MORE than the saved bf16 matmul passes (80 vs 73 ms/step at band=64),
# so it stays off; the implementation remains for hardware where matmuls are
# the binding constraint (parity-tested in tests/test_pallas_warp.py)
WARP_BAND = int(os.environ.get("PIXRAY_TPU_WARP_BAND", "0"))


def _mm(a, b, prec):
    """(T, H) @ (H, W) -> (T, W) f32 at the requested precision."""
    if prec == "highest":
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if prec == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    # "high": error-compensated bf16 (drop the lo*lo term) — matches f32 to
    # ~2^-16 relative in half the passes of a 6-pass f32 matmul
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_lo, b_hi) + dot(a_hi, b_lo)


def _mm_t(a, b, prec):
    """aᵀ @ b via dot_general contracting axis 0 of both — no materialized
    transpose: (T, H), (T, W) -> (H, W) f32."""
    dn = (((0,), (0,)), ((), ()))
    if prec == "highest":
        return jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if prec == "bf16":
        return jax.lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                                   dn, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x, y: jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_lo, b_hi) + dot(a_hi, b_lo)


def _coords_for_tile(inv_ref, kt, k_tile, out_size, dtype):
    """Source coords for this tile's output pixels, from the inverse homography.

    Mosaic-conservative: the homography scalars come from an SMEM block, every
    intermediate is 2D (k_tile, 1).  Returns sx, sy with shape (k_tile, 1)."""
    k0 = kt * k_tile
    k = k0 + jax.lax.broadcasted_iota(jnp.int32, (k_tile, 1), 0)  # (k_tile, 1)
    i = (k // out_size).astype(dtype)
    j = (k % out_size).astype(dtype)
    m00 = inv_ref[0, 0, 0]
    m01 = inv_ref[0, 0, 1]
    m02 = inv_ref[0, 0, 2]
    m10 = inv_ref[0, 1, 0]
    m11 = inv_ref[0, 1, 1]
    m12 = inv_ref[0, 1, 2]
    m20 = inv_ref[0, 2, 0]
    m21 = inv_ref[0, 2, 1]
    m22 = inv_ref[0, 2, 2]
    denom = m20 * j + m21 * i + m22 + 1e-8
    sx = (m00 * j + m01 * i + m02) / denom
    sy = (m10 * j + m11 * i + m12) / denom
    return sx, sy


def _pad_coords(sx, sy, h, w, padding_mode):
    if padding_mode == "reflection":
        def refl(x, size):
            span = 2.0 * size
            x = jnp.mod(x + 0.5, span)
            x = jnp.where(x >= size, span - x - 1e-6, x)
            return x - 0.5
        return refl(sx, w), refl(sy, h)
    if padding_mode == "border":
        return jnp.clip(sx, 0.0, w - 1.0), jnp.clip(sy, 0.0, h - 1.0)
    return sx, sy


def _tile_sy_bounds(inv_ref, kt, k_tile, out_size):
    """Exact [min, max] of the RAW (pre-padding) source row coordinate over this
    tile's output pixels.

    A projective map restricted to an axis-aligned rectangle attains its
    extremes at the rectangle's corners (sy along each edge is a Möbius
    function of the edge parameter, monotone when the denominator keeps its
    sign — true for the bounded cutout transform family), so evaluating the 4
    corners of the covering row-range × full column-range rectangle bounds sy
    exactly."""
    k0 = kt * k_tile
    r0 = jnp.float32(0) + (k0 // out_size)
    r1 = jnp.minimum((k0 + k_tile - 1) // out_size, out_size - 1).astype(jnp.float32)
    m10 = inv_ref[0, 1, 0]
    m11 = inv_ref[0, 1, 1]
    m12 = inv_ref[0, 1, 2]
    m20 = inv_ref[0, 2, 0]
    m21 = inv_ref[0, 2, 1]
    m22 = inv_ref[0, 2, 2]
    lo = jnp.float32(1e30)
    hi = jnp.float32(-1e30)
    for jj in (jnp.float32(0.0), jnp.float32(out_size - 1)):
        for ii in (r0.astype(jnp.float32), r1):
            d = m20 * jj + m21 * ii + m22 + 1e-8
            sy = (m10 * jj + m11 * ii + m12) / d
            lo = jnp.minimum(lo, sy)
            hi = jnp.maximum(hi, sy)
    return lo, hi


# band safety margin: sublane alignment (7) + bilinear support (2) + slack
_BAND_MARGIN = 11


def _band_plan(lo, hi, h, band, padding_mode):
    """(ok, base) for the banded branch given raw sy extremes [lo, hi].

    border: clamping is monotone, so the clamped extremes are exact — band on
    them.  zeros/fill: out-of-canvas taps have zero hat weight against real
    rows in BOTH branches, so the in-canvas portion [clip(lo), clip(hi)] is all
    that matters.  reflection: wrapping breaks corner-extremality, so the band
    applies only when the raw range stays fully inside the canvas."""
    if padding_mode == "reflection":
        in_canvas = jnp.logical_and(lo >= 0.0, hi <= h - 1.0)
        ok = jnp.logical_and(in_canvas, (hi - lo) <= (band - _BAND_MARGIN))
    else:
        lo = jnp.clip(lo, 0.0, h - 1.0)
        hi = jnp.clip(hi, 0.0, h - 1.0)
        ok = (hi - lo) <= (band - _BAND_MARGIN)
    base = jnp.clip(jnp.floor(lo).astype(jnp.int32) - 1, 0, h - band)
    base = (base // 8) * 8
    return ok, base


def _fwd_kernel(inv_ref, work_ref, out_ref, *, k_tile, out_size, padding_mode,
                channels, prec, band):
    # work_ref: (C, H, W) channel-major so the lane dimension is the wide axis
    h, w = work_ref.shape[1], work_ref.shape[2]
    kt = pl.program_id(1)
    sx, sy = _coords_for_tile(inv_ref, kt, k_tile, out_size, jnp.float32)  # (T, 1)
    sx, sy = _pad_coords(sx, sy, h, w, padding_mode)

    v = jax.lax.broadcasted_iota(jnp.int32, (k_tile, w), 1).astype(jnp.float32)
    b = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v))  # (T, W)

    def full_rows():
        u = jax.lax.broadcasted_iota(jnp.int32, (k_tile, h), 1).astype(jnp.float32)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))  # (T, H)
        for c in range(channels):
            tmp = _mm(a, work_ref[c].astype(jnp.float32), prec)  # (T, W)
            out_ref[0, c, :] = jnp.sum(tmp * b, axis=1)

    if not band:
        full_rows()
        return

    # adaptive row banding: most cutout tiles read a narrow horizontal band of
    # the canvas (median span ~20 rows at 224² tiles; only strong-perspective
    # draws exceed it), so the hat matmul usually needs `band` rows, not H.
    # The bound is exact (corner extremes) and the wide-span / out-of-canvas
    # minority falls back to the full matmul — never a wrong pixel.
    lo, hi = _tile_sy_bounds(inv_ref, kt, k_tile, out_size)
    ok, base = _band_plan(lo, hi, h, band, padding_mode)

    @pl.when(ok)
    def _banded():
        ub = base.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (k_tile, band), 1
        ).astype(jnp.float32)
        ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - ub))  # (T, B)
        for c in range(channels):
            wb = work_ref[c, pl.ds(base, band), :].astype(jnp.float32)
            tmp = _mm(ab, wb, prec)  # (T, W)
            out_ref[0, c, :] = jnp.sum(tmp * b, axis=1)

    @pl.when(jnp.logical_not(ok))
    def _full():
        full_rows()


def _bwd_kernel(inv_ref, g_ref, dwork_ref, *, k_tile, out_size, padding_mode,
                channels, prec, band):
    # dwork_ref: (C, H, W); g_ref: (1, C, k_tile)
    h, w = dwork_ref.shape[1], dwork_ref.shape[2]
    kt = pl.program_id(1)
    n = pl.program_id(0)

    @pl.when(jnp.logical_and(n == 0, kt == 0))
    def _():
        dwork_ref[...] = jnp.zeros_like(dwork_ref)

    sx, sy = _coords_for_tile(inv_ref, kt, k_tile, out_size, jnp.float32)  # (T, 1)
    sx, sy = _pad_coords(sx, sy, h, w, padding_mode)

    v = jax.lax.broadcasted_iota(jnp.int32, (k_tile, w), 1).astype(jnp.float32)
    b = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v))  # (T, W)

    def full_rows():
        u = jax.lax.broadcasted_iota(jnp.int32, (k_tile, h), 1).astype(jnp.float32)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))  # (T, H)
        for c in range(channels):
            gb = b * g_ref[0, c, :].reshape(k_tile, 1)  # (T, W)
            contrib = _mm_t(a, gb, prec)  # (H, W)
            dwork_ref[c] += contrib

    if not band:
        full_rows()
        return

    lo, hi = _tile_sy_bounds(inv_ref, kt, k_tile, out_size)
    ok, base = _band_plan(lo, hi, h, band, padding_mode)

    @pl.when(ok)
    def _banded():
        ub = base.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (k_tile, band), 1
        ).astype(jnp.float32)
        ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - ub))  # (T, B)
        for c in range(channels):
            gb = b * g_ref[0, c, :].reshape(k_tile, 1)  # (T, W)
            contrib = _mm(ab.T, gb, prec)  # (B, W)
            dwork_ref[c, pl.ds(base, band), :] += contrib

    @pl.when(jnp.logical_not(ok))
    def _full():
        full_rows()


def _band_for(h: int, band: int) -> int:
    """Disable banding on canvases too short for a band plus slack."""
    return band if (band and h >= band + 16) else 0


def _compiler_params():
    """Optional Mosaic grid-semantics override (P0 NaN debugging knob).

    PIXRAY_TPU_WARP_SERIAL=1 forces both grid dimensions to ARBITRARY
    (strictly sequential execution, no cross-step parallelism) — used to test
    whether the TPU backward miscompile is a grid-parallelization artifact.
    Read at call time so experiments can flip it per configuration."""
    if os.environ.get("PIXRAY_TPU_WARP_SERIAL", "0") == "1":
        return pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        )
    return None


def _norm_prec(prec):
    """int8 exists only on the transposed multi forward; every other kernel
    (row-major/banded forwards, all backwards) runs it as bf16."""
    return "bf16" if prec == "int8" else prec


# Opt-in int8 rung for the transposed-banded BACKWARD (the default bwd path):
# same per-tensor symmetric-quantization argument as the CLIP tower's int8 dx
# (models/perceptor.py PIXRAY_TPU_CLIP_PREC=int8b) — the cotangent is
# pre-scaled to unit max outside the kernel, the banded hat-with-cotangent
# product ag = ab*g and the x-hat b both live in [-1,1] so a fixed 127 scale
# quantizes them in-kernel with no reductions; the s_g/127^2 dequant applies
# once outside (the contraction is linear).  Guarded by the bench precision
# ladder like every other rung.  "bf16" restores the round-4 backward.
WARP_BWD_PREC = os.environ.get("PIXRAY_TPU_WARP_BWD_PREC", "bf16")


def _run_fwd(work, inv_matrices, out_size, padding_mode, interpret, k_tile, prec, band):
    prec = _norm_prec(prec)
    n = inv_matrices.shape[0]
    h, w, c = work.shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    kernel = functools.partial(
        _fwd_kernel, k_tile=k_tile, out_size=out_size, padding_mode=padding_mode,
        channels=c, prec=prec, band=_band_for(h, band),
    )
    work_cm = work.transpose(2, 0, 1)  # (C, H, W): lanes = the wide spatial axis
    out = pl.pallas_call(
        kernel,
        grid=(n, k_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, k_tiles * k_tile), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(inv_matrices, work_cm)
    return (
        out[:, :, :k].transpose(0, 2, 1).reshape(n, out_size, out_size, c).astype(work.dtype)
    )


def _run_bwd(g, inv_matrices, work_shape, out_size, padding_mode, interpret,
             k_tile, prec, band):
    prec = _norm_prec(prec)
    n = inv_matrices.shape[0]
    h, w, c = work_shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    g_flat = g.reshape(n, k, c).transpose(0, 2, 1).astype(jnp.float32)  # (N, C, K)
    pad = k_tiles * k_tile - k
    if pad:
        g_flat = jnp.pad(g_flat, ((0, 0), (0, 0), (0, pad)))
    kernel = functools.partial(
        _bwd_kernel, k_tile=k_tile, out_size=out_size, padding_mode=padding_mode,
        channels=c, prec=prec, band=_band_for(h, band),
    )
    dwork = pl.pallas_call(
        kernel,
        grid=(n, k_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(inv_matrices, g_flat)
    return dwork.transpose(1, 2, 0)


# ---------------------------------------------------------------------------
# unified multi-mode chunked kernel
#
# One kernel call renders the WHOLE cutout bank: padding is a per-matrix mode
# (0=reflection, 1=border, 2=zeros) selected with vector math inside the
# kernel, so the engine's zoom (reflection/border by iteration parity) and wide
# (zeros+fill) branches fuse into a single launch — no lax.cond, no separate
# wide kernel.  Cutouts are processed N_CHUNK at a time per grid step, which
# amortizes Mosaic's per-grid-step overhead (~1.7 us/tile measured — a third of
# the old kernel's runtime at 64x98 single-cut tiles).
# ---------------------------------------------------------------------------

N_CHUNK = int(os.environ.get("PIXRAY_TPU_WARP_NCHUNK", "8"))

# padding modes.  MODE_FILL is zeros-padding PLUS the closed-form coverage
# composite toward a traced fill value (the reference's random-gray wide-cut
# fill) computed INSIDE the kernel — it costs a handful of VPU ops per tile and
# removes the full-bank elementwise fill pass the engine used to run outside.
MODE_REFLECT, MODE_BORDER, MODE_ZEROS, MODE_FILL = 0, 1, 2, 3


def _select_padded(sx, sy, mode, h, w):
    """Per-cut padding-mode coordinate transform.

    ``mode`` is a traced f32 scalar (0=reflection, 1=border, 2=zeros/fill)
    carried in the 4th row of the augmented matrix block — Mosaic's SMEM
    block-shape rules reject a separate (n_chunk, 1) modes block, so the mode
    rides with the homography."""
    def refl(x, size):
        span = 2.0 * size
        x = jnp.mod(x + 0.5, span)
        x = jnp.where(x >= size, span - x - 1e-6, x)
        return x - 0.5

    is_refl = mode < 0.5
    is_border = jnp.logical_and(mode >= 0.5, mode < 1.5)
    sx_p = jnp.where(is_refl, refl(sx, w), jnp.where(is_border, jnp.clip(sx, 0.0, w - 1.0), sx))
    sy_p = jnp.where(is_refl, refl(sy, h), jnp.where(is_border, jnp.clip(sy, 0.0, h - 1.0), sy))
    return sx_p, sy_p


def _chunk_coords(inv_ref, s, kt, k_tile, out_size, h, w, row=False, with_raw=False):
    """Padded source coords for chunk member ``s`` of this tile.

    inv_ref: (n_chunk, 4, 3) SMEM — rows 0-2 the inverse homography, row 3
    carries (mode, 0, fill).  ``row=True`` lays the k_tile axis along LANES
    ((1, k_tile) row vectors) for the transposed forward kernel; the default
    column layout ((k_tile, 1)) serves the row-major kernels.  ``with_raw``
    additionally returns the pre-padding coords (for the fill coverage)."""
    k0 = kt * k_tile
    if row:
        k = k0 + jax.lax.broadcasted_iota(jnp.int32, (1, k_tile), 1)
    else:
        k = k0 + jax.lax.broadcasted_iota(jnp.int32, (k_tile, 1), 0)
    i = (k // out_size).astype(jnp.float32)
    j = (k % out_size).astype(jnp.float32)
    m00 = inv_ref[s, 0, 0]
    m01 = inv_ref[s, 0, 1]
    m02 = inv_ref[s, 0, 2]
    m10 = inv_ref[s, 1, 0]
    m11 = inv_ref[s, 1, 1]
    m12 = inv_ref[s, 1, 2]
    m20 = inv_ref[s, 2, 0]
    m21 = inv_ref[s, 2, 1]
    m22 = inv_ref[s, 2, 2]
    denom = m20 * j + m21 * i + m22 + 1e-8
    sx = (m00 * j + m01 * i + m02) / denom
    sy = (m10 * j + m11 * i + m12) / denom
    sx_p, sy_p = _select_padded(sx, sy, inv_ref[s, 3, 0], h, w)
    if with_raw:
        return sx_p, sy_p, sx, sy
    return sx_p, sy_p


def _fill_term(inv_ref, s, sx_raw, sy_raw, h, w):
    """In-kernel fill composite: ``(1-cover)*fill_pre`` for MODE_FILL cuts.

    cover is the closed-form bilinear coverage of the canvas at the RAW source
    coordinate (the sum of in-bounds hat weights: 1 in the interior, ramping to
    0 across the one-pixel border band) — warping a ones-canvas in two VPU ops.
    Zero for every other mode; the warp output is already zero wherever
    cover==0 (all hats vanish), so adding this term reproduces the engine's
    random-gray wide-cut fill exactly with no full-bank pass outside."""
    mode = inv_ref[s, 3, 0]
    fillp = inv_ref[s, 3, 2]
    cx = jnp.clip(jnp.minimum(sx_raw + 1.0, w - sx_raw), 0.0, 1.0)
    cy = jnp.clip(jnp.minimum(sy_raw + 1.0, h - sy_raw), 0.0, 1.0)
    return jnp.where(mode >= 2.5, (1.0 - cx * cy) * fillp, 0.0)


def _augment_inv(inv, modes, fill=None):
    """(N,3,3) inverse matrices + (N,) modes -> (N,4,3): row 3 = (mode, 0, fill).

    ``fill`` is the traced fill value for MODE_FILL cuts (pre-divided by the
    int8 dequant scale when the forward runs the int8 MXU path, so the single
    post-scale multiply outside the kernel restores it exactly)."""
    zeros = jnp.zeros_like(modes, jnp.float32)
    f = zeros if fill is None else jnp.broadcast_to(
        jnp.asarray(fill, jnp.float32), modes.shape
    )
    mode_row = jnp.stack([modes.astype(jnp.float32), zeros, f], axis=-1)[:, None, :]
    return jnp.concatenate([inv, mode_row], axis=1)


def _chunk_band_plan(inv_ref, s, kt, k_tile, out_size, h, band):
    """Mode-aware (ok, base) for chunk member s: reflection (mode row < 0.5)
    requires the raw range in-canvas; border/zeros band on clamped extremes
    (monotone clamp keeps corner-extremality; out-of-canvas taps are zero)."""
    k0 = kt * k_tile
    r0 = jnp.float32(0) + (k0 // out_size)
    r1 = jnp.minimum((k0 + k_tile - 1) // out_size, out_size - 1).astype(jnp.float32)
    m10 = inv_ref[s, 1, 0]
    m11 = inv_ref[s, 1, 1]
    m12 = inv_ref[s, 1, 2]
    m20 = inv_ref[s, 2, 0]
    m21 = inv_ref[s, 2, 1]
    m22 = inv_ref[s, 2, 2]
    lo = jnp.float32(1e30)
    hi = jnp.float32(-1e30)
    for jj in (jnp.float32(0.0), jnp.float32(out_size - 1)):
        for ii in (r0.astype(jnp.float32), r1):
            d = m20 * jj + m21 * ii + m22 + 1e-8
            sy = (m10 * jj + m11 * ii + m12) / d
            lo = jnp.minimum(lo, sy)
            hi = jnp.maximum(hi, sy)
    is_refl = inv_ref[s, 3, 0] < 0.5
    in_canvas = jnp.logical_and(lo >= 0.0, hi <= h - 1.0)
    lo_c = jnp.clip(lo, 0.0, h - 1.0)
    hi_c = jnp.clip(hi, 0.0, h - 1.0)
    narrow = (hi_c - lo_c) <= (band - _BAND_MARGIN)
    ok = jnp.where(is_refl, jnp.logical_and(in_canvas, narrow), narrow)
    base = jnp.clip(jnp.floor(lo_c).astype(jnp.int32) - 1, 0, h - band)
    base = (base // 8) * 8
    return ok, base


def _fwd_kernel_multi(inv_ref, work_ref, out_ref, *, k_tile, out_size,
                      channels, prec, n_chunk, band):
    h, w = work_ref.shape[1], work_ref.shape[2]
    kt = pl.program_id(1)
    u = jax.lax.broadcasted_iota(jnp.int32, (k_tile, h), 1).astype(jnp.float32)
    v = jax.lax.broadcasted_iota(jnp.int32, (k_tile, w), 1).astype(jnp.float32)
    ub0 = jax.lax.broadcasted_iota(jnp.int32, (k_tile, band), 1).astype(jnp.float32) if band else None
    for s in range(n_chunk):
        sx, sy, sx_r, sy_r = _chunk_coords(
            inv_ref, s, kt, k_tile, out_size, h, w, with_raw=True
        )
        fill_add = _fill_term(inv_ref, s, sx_r, sy_r, h, w)[:, 0]  # (T,)
        b = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v))  # (T, W)
        if not band:
            a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))  # (T, H)
            for c in range(channels):
                tmp = _mm(a, work_ref[c].astype(jnp.float32), prec)
                out_ref[s, c, :] = jnp.sum(tmp * b, axis=1) + fill_add
            continue
        ok, base = _chunk_band_plan(inv_ref, s, kt, k_tile, out_size, h, band)

        @pl.when(ok)
        def _banded(s=s, sx=sx, sy=sy, b=b, base=base, fill_add=fill_add):
            ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (base.astype(jnp.float32) + ub0)))
            for c in range(channels):
                wb = work_ref[c, pl.ds(base, band), :].astype(jnp.float32)
                tmp = _mm(ab, wb, prec)
                out_ref[s, c, :] = jnp.sum(tmp * b, axis=1) + fill_add

        @pl.when(jnp.logical_not(ok))
        def _full(s=s, sy=sy, b=b, fill_add=fill_add):
            a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))
            for c in range(channels):
                tmp = _mm(a, work_ref[c].astype(jnp.float32), prec)
                out_ref[s, c, :] = jnp.sum(tmp * b, axis=1) + fill_add


def _fwd_kernel_multi_T(inv_ref, work_ref, out_ref, *, k_tile, out_size,
                        channels, prec, n_chunk):
    """Transposed-layout forward: the k_tile axis stays in LANES end-to-end.

    work_ref is the (C, W, H) transposed canvas, so the hat-y contraction is
    tmpT = workT_c (W,H) @ aT (H,T) -> (W,T); the hat-x multiply and the 2-tap
    x-interpolation sum then reduce over SUBLANES and the (T,) result writes
    straight into the lane-major output block.  The row-major kernel's
    cross-lane reduce + (T,1)->(T,) column extract cost ~6 ms/step at the
    flagship shapes (tools/exp8_fwd_kernel.py ablations); this layout removes
    both at identical MXU work."""
    w, h = work_ref.shape[1], work_ref.shape[2]
    kt = pl.program_id(1)
    u_col = jax.lax.broadcasted_iota(jnp.int32, (h, k_tile), 0).astype(jnp.float32)
    v_col = jax.lax.broadcasted_iota(jnp.int32, (w, k_tile), 0).astype(jnp.float32)
    for s in range(n_chunk):
        sx, sy, sx_r, sy_r = _chunk_coords(
            inv_ref, s, kt, k_tile, out_size, h, w, row=True, with_raw=True
        )
        fill_add = _fill_term(inv_ref, s, sx_r, sy_r, h, w)[0]  # (T,)
        a_t = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u_col))  # (H, T)
        b_t = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v_col))  # (W, T)
        if prec == "int8":
            # int8 MXU path (~1.3x the bf16 kernel on v5e): work arrives
            # pre-quantized (symmetric, dynamic scale — _run_fwd_multi_T),
            # hats quantize to round(a*127) in-kernel; the combined
            # s_w/127^2 dequant is folded into the output OUTSIDE the kernel
            # (the warp is linear in work, and the fill term arrives
            # pre-divided by that scale).  Error ~9e-3 on [0,1] canvases —
            # an order below the engine's noise_fac=0.1 forward noise.
            a_q = jnp.round(a_t * 127.0).astype(jnp.int8)
            dn = (((1,), (0,)), ((), ()))
            for c in range(channels):
                tmp_i = jax.lax.dot_general(work_ref[c], a_q, dn,
                                            preferred_element_type=jnp.int32)
                out_ref[s, c, :] = jnp.sum(tmp_i.astype(jnp.float32) * b_t, axis=0) + fill_add
            continue
        for c in range(channels):
            tmp_t = _mm(work_ref[c].astype(jnp.float32), a_t, prec)  # (W, T)
            out_ref[s, c, :] = jnp.sum(tmp_t * b_t, axis=0) + fill_add


def _fwd_kernel_multi_TB(inv_ref, work_ref, out_ref, *, k_tile, out_size,
                         channels, prec, n_chunk, band):
    """Transposed-layout BANDED forward: k_tile in lanes AND the hat-y
    contraction reduced to a `band`-row slice of the canvas.

    work_ref is (C, H, W) — H in SUBLANES so the band is an 8-aligned sublane
    slice (the (C, W, H) layout of _fwd_kernel_multi_T would put H in lanes,
    where dynamic slices need 128 alignment).  The contraction is the TN form
    dot_general((B, W), (B, T)) -> (W, T); the x-interpolation reduce runs
    over sublanes exactly as in the unbanded transposed kernel.  Tiles whose
    source-row span exceeds the band (strong perspective draws) fall back to
    the full-H matmul — the plan is exact (corner extremes), never a wrong
    pixel."""
    h, w = work_ref.shape[1], work_ref.shape[2]
    kt = pl.program_id(1)
    u_col = jax.lax.broadcasted_iota(jnp.int32, (h, k_tile), 0).astype(jnp.float32)
    v_col = jax.lax.broadcasted_iota(jnp.int32, (w, k_tile), 0).astype(jnp.float32)
    ub0 = jax.lax.broadcasted_iota(jnp.int32, (band, k_tile), 0).astype(jnp.float32)
    for s in range(n_chunk):
        sx, sy, sx_r, sy_r = _chunk_coords(
            inv_ref, s, kt, k_tile, out_size, h, w, row=True, with_raw=True
        )
        fill_add = _fill_term(inv_ref, s, sx_r, sy_r, h, w)[0]  # (T,)
        b_t = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v_col))  # (W, T)
        ok, base = _chunk_band_plan(inv_ref, s, kt, k_tile, out_size, h, band)

        @pl.when(ok)
        def _banded(s=s, sy=sy, b_t=b_t, base=base, fill_add=fill_add):
            ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (base.astype(jnp.float32) + ub0)))
            for c in range(channels):
                wb = work_ref[c, pl.ds(base, band), :]  # (B, W)
                tmp = _mm_t(wb, ab, prec)  # (W, T)
                out_ref[s, c, :] = jnp.sum(tmp * b_t, axis=0) + fill_add

        @pl.when(jnp.logical_not(ok))
        def _full(s=s, sy=sy, b_t=b_t, fill_add=fill_add):
            a_t = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u_col))  # (H, T)
            for c in range(channels):
                tmp = _mm_t(work_ref[c], a_t, prec)  # (W, T)
                out_ref[s, c, :] = jnp.sum(tmp * b_t, axis=0) + fill_add


def _pad_bank(inv, modes, n_blocks, n_chunk):
    pad_n = n_blocks * n_chunk - inv.shape[0]
    if pad_n:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=inv.dtype), (pad_n, 3, 3))
        inv = jnp.concatenate([inv, eye], 0)
        modes = jnp.concatenate([modes, jnp.full((pad_n,), MODE_ZEROS, modes.dtype)], 0)
    return inv, modes


def _finish_fwd(out, n, k, out_size, c, dtype, out_layout, post_scale=None):
    """Slice the padded kernel output and lay it out for the consumer.

    'nhwc' restores the reference layout; 'nchw' keeps the kernel's native
    channel-major layout — the (n, c, K)→(n, K, c) relayout (a full-bank HBM
    pass each way, fwd and bwd) disappears and the downstream epilogue +
    channel-major patchify consume it directly."""
    if post_scale is not None:
        out = out * post_scale
    out = out[:n, :, :k]
    if out_layout == "nchw":
        return out.reshape(n, c, out_size, out_size).astype(dtype)
    return out.transpose(0, 2, 1).reshape(n, out_size, out_size, c).astype(dtype)


def _g_flat(g, n, k, c, out_layout):
    """Cotangent to the kernels' (N, C, K) layout (free under 'nchw')."""
    if out_layout == "nchw":
        return g.reshape(n, c, k).astype(jnp.float32)
    return g.reshape(n, k, c).transpose(0, 2, 1).astype(jnp.float32)


def _run_fwd_multi_TB(work, inv, modes, fill, out_size, interpret, k_tile, prec,
                      n_chunk, band, out_layout):
    n = inv.shape[0]
    h, w, c = work.shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    n_blocks = pl.cdiv(n, n_chunk)
    inv, modes = _pad_bank(inv, modes, n_blocks, n_chunk)
    aug = _augment_inv(inv, modes, fill)
    kernel = functools.partial(
        _fwd_kernel_multi_TB, k_tile=k_tile, out_size=out_size, channels=c,
        prec=prec, n_chunk=n_chunk, band=band,
    )
    work_cm = work.transpose(2, 0, 1).astype(jnp.float32)  # (C, H, W)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((n_chunk, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_chunk, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * n_chunk, c, k_tiles * k_tile), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(aug, work_cm)
    return _finish_fwd(out, n, k, out_size, c, work.dtype, out_layout)


def _bwd_kernel_multi_TB(inv_ref, g_ref, dwork_ref, *, k_tile, out_size,
                         channels, prec, n_chunk, band):
    """Transposed-layout BANDED backward: dwork[c, base:base+B, :] += abᵀ-style
    NT contraction of the banded hat-y against the lane-major cotangent row.

    Same accumulation contract as _bwd_kernel_multi_T (dwork block revisited
    across the whole grid, zeroed on first visit); only the hat rows inside the
    band are touched per tile, with the full-H fallback for wide-span tiles."""
    h, w = dwork_ref.shape[1], dwork_ref.shape[2]
    kt = pl.program_id(1)
    nb = pl.program_id(0)

    @pl.when(jnp.logical_and(nb == 0, kt == 0))
    def _():
        dwork_ref[...] = jnp.zeros_like(dwork_ref)

    u_col = jax.lax.broadcasted_iota(jnp.int32, (h, k_tile), 0).astype(jnp.float32)
    v_col = jax.lax.broadcasted_iota(jnp.int32, (w, k_tile), 0).astype(jnp.float32)
    ub0 = jax.lax.broadcasted_iota(jnp.int32, (band, k_tile), 0).astype(jnp.float32)
    dn_nt = (((1,), (1,)), ((), ()))
    for s in range(n_chunk):
        sx, sy = _chunk_coords(inv_ref, s, kt, k_tile, out_size, h, w, row=True)
        b_t = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v_col))  # (W, T)
        ok, base = _chunk_band_plan(inv_ref, s, kt, k_tile, out_size, h, band)

        if prec == "int8":
            # int8 MXU backward: g arrives pre-scaled to [-1, 1]
            # (_run_bwd_multi_TB divides by s_g and re-applies s_g/127^2 to
            # the summed dwork outside), so ag = ab*g and the x-hat both
            # quantize at the fixed 127 scale with no in-kernel reductions.
            # Folding g into the BANDED hat (B x T) instead of the x-hat
            # (W x T) keeps the per-channel quantize 6x smaller; b_q is
            # shared across channels.
            b_q = jnp.round(b_t * 127.0).astype(jnp.int8)

            @pl.when(ok)
            def _banded_q(s=s, sy=sy, b_q=b_q, base=base):
                ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (base.astype(jnp.float32) + ub0)))
                for c in range(channels):
                    ag = ab * g_ref[s, c, :].reshape(1, k_tile)  # (B, T)
                    ag_q = jnp.round(ag * 127.0).astype(jnp.int8)
                    acc = jax.lax.dot_general(ag_q, b_q, dn_nt,
                                              preferred_element_type=jnp.int32)
                    dwork_ref[c, pl.ds(base, band), :] += acc.astype(jnp.float32)

            @pl.when(jnp.logical_not(ok))
            def _full_q(s=s, sy=sy, b_q=b_q):
                a_t = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u_col))  # (H, T)
                for c in range(channels):
                    ag = a_t * g_ref[s, c, :].reshape(1, k_tile)
                    ag_q = jnp.round(ag * 127.0).astype(jnp.int8)
                    acc = jax.lax.dot_general(ag_q, b_q, dn_nt,
                                              preferred_element_type=jnp.int32)
                    dwork_ref[c] += acc.astype(jnp.float32)
            continue

        @pl.when(ok)
        def _banded(s=s, sy=sy, b_t=b_t, base=base):
            ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (base.astype(jnp.float32) + ub0)))
            for c in range(channels):
                gb = b_t * g_ref[s, c, :].reshape(1, k_tile)  # (W, T)
                dwork_ref[c, pl.ds(base, band), :] += _mm_nt(ab, gb, prec)  # (B, W)

        @pl.when(jnp.logical_not(ok))
        def _full(s=s, sy=sy, b_t=b_t):
            a_t = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u_col))  # (H, T)
            for c in range(channels):
                gb = b_t * g_ref[s, c, :].reshape(1, k_tile)
                dwork_ref[c] += _mm_nt(a_t, gb, prec)


def _run_bwd_multi_TB(g, inv, modes, work_shape, out_size, interpret, k_tile,
                      prec, n_chunk, band, out_layout):
    n = inv.shape[0]
    h, w, c = work_shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    n_blocks = pl.cdiv(n, n_chunk)
    pad_n = n_blocks * n_chunk - n
    g_flat = _g_flat(g, n, k, c, out_layout)
    pad_k = k_tiles * k_tile - k
    if pad_k or pad_n:
        g_flat = jnp.pad(g_flat, ((0, pad_n), (0, 0), (0, pad_k)))
    post_scale = None
    if prec == "int8":
        # per-tensor symmetric cotangent scale (the int8-dx recipe): the
        # kernel sees g/s_g in [-1, 1] and accumulates raw 127^2-scaled
        # products; the contraction is linear so one dequant applies at the
        # end outside the kernel.
        s_g = jnp.maximum(jnp.max(jnp.abs(g_flat)).astype(jnp.float32), 1e-20)
        g_flat = g_flat.astype(jnp.float32) / s_g
        post_scale = s_g / (127.0 * 127.0)
    inv, modes = _pad_bank(inv, modes, n_blocks, n_chunk)
    aug = _augment_inv(inv, modes)
    kernel = functools.partial(
        _bwd_kernel_multi_TB, k_tile=k_tile, out_size=out_size, channels=c,
        prec=prec, n_chunk=n_chunk, band=band,
    )
    dwork = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((n_chunk, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_chunk, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(aug, g_flat)
    if post_scale is not None:
        dwork = dwork * post_scale
    return dwork.transpose(1, 2, 0)


def _run_fwd_multi_T(work, inv, modes, fill, out_size, interpret, k_tile, prec,
                     n_chunk, out_layout):
    n = inv.shape[0]
    h, w, c = work.shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    n_blocks = pl.cdiv(n, n_chunk)
    inv, modes = _pad_bank(inv, modes, n_blocks, n_chunk)
    kernel = functools.partial(
        _fwd_kernel_multi_T, k_tile=k_tile, out_size=out_size, channels=c,
        prec=prec, n_chunk=n_chunk,
    )
    work_wm = work.transpose(2, 1, 0)  # (C, W, H)
    post_scale = None
    if prec == "int8":
        s_w = jnp.maximum(jnp.max(jnp.abs(work)).astype(jnp.float32), 1e-6)
        work_wm = jnp.round(work_wm.astype(jnp.float32) / s_w * 127.0).astype(jnp.int8)
        post_scale = s_w / (127.0 * 127.0)
        if fill is not None:
            # the fill term adds inside the kernel's pre-dequant domain
            fill = fill / post_scale
    aug = _augment_inv(inv, modes, fill)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((n_chunk, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, w, h), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_chunk, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * n_chunk, c, k_tiles * k_tile), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(aug, work_wm)
    return _finish_fwd(out, n, k, out_size, c, work.dtype, out_layout, post_scale)


def _bwd_kernel_multi(inv_ref, g_ref, dwork_ref, *, k_tile, out_size,
                      channels, prec, n_chunk, band):
    h, w = dwork_ref.shape[1], dwork_ref.shape[2]
    kt = pl.program_id(1)
    nb = pl.program_id(0)

    @pl.when(jnp.logical_and(nb == 0, kt == 0))
    def _():
        dwork_ref[...] = jnp.zeros_like(dwork_ref)

    u = jax.lax.broadcasted_iota(jnp.int32, (k_tile, h), 1).astype(jnp.float32)
    v = jax.lax.broadcasted_iota(jnp.int32, (k_tile, w), 1).astype(jnp.float32)
    ub0 = jax.lax.broadcasted_iota(jnp.int32, (k_tile, band), 1).astype(jnp.float32) if band else None
    for s in range(n_chunk):
        sx, sy = _chunk_coords(inv_ref, s, kt, k_tile, out_size, h, w)
        b = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v))
        if not band:
            a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))
            for c in range(channels):
                gb = b * g_ref[s, c, :].reshape(k_tile, 1)
                dwork_ref[c] += _mm_t(a, gb, prec)
            continue
        ok, base = _chunk_band_plan(inv_ref, s, kt, k_tile, out_size, h, band)

        @pl.when(ok)
        def _banded(s=s, sx=sx, sy=sy, b=b, base=base):
            ab = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (base.astype(jnp.float32) + ub0)))
            for c in range(channels):
                gb = b * g_ref[s, c, :].reshape(k_tile, 1)
                dwork_ref[c, pl.ds(base, band), :] += _mm_t(ab, gb, prec)

        @pl.when(jnp.logical_not(ok))
        def _full(s=s, sy=sy, b=b):
            a = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u))
            for c in range(channels):
                gb = b * g_ref[s, c, :].reshape(k_tile, 1)
                dwork_ref[c] += _mm_t(a, gb, prec)


def _run_fwd_multi(work, inv, modes, fill, out_size, interpret, k_tile, prec,
                   n_chunk, band, out_layout):
    if os.environ.get("PIXRAY_TPU_WARP_FWDT", "1") != "0":
        # default: transposed-layout kernels.  The FORWARD stays on the dense
        # int8 kernel even when a band is requested: measured on v5e the fwd
        # is VPU-bound (hat builds + x-interpolation multiply-reduce), so the
        # banded matmul saves nothing and the per-tile plan costs ~1.5 ms
        # (int8 dense 4.05 vs banded-bf16 5.54 ms at 48 cuts).  The banded
        # transposed fwd remains available for audits/other hardware via
        # PIXRAY_TPU_WARP_FWD_TB=1.  (PIXRAY_TPU_WARP_FWDT=0 falls back to
        # the row-major kernels below, where `band` is honored.)
        band_eff = _band_for(work.shape[0], band)
        if band_eff and os.environ.get("PIXRAY_TPU_WARP_FWD_TB", "0") == "1":
            return _run_fwd_multi_TB(work, inv, modes, fill, out_size, interpret,
                                     k_tile, _norm_prec(prec), n_chunk, band_eff,
                                     out_layout)
        return _run_fwd_multi_T(work, inv, modes, fill, out_size, interpret,
                                k_tile, prec, n_chunk, out_layout)
    prec = _norm_prec(prec)
    n = inv.shape[0]
    h, w, c = work.shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    n_blocks = pl.cdiv(n, n_chunk)
    inv, modes = _pad_bank(inv, modes, n_blocks, n_chunk)
    aug = _augment_inv(inv, modes, fill)
    kernel = functools.partial(
        _fwd_kernel_multi, k_tile=k_tile, out_size=out_size, channels=c,
        prec=prec, n_chunk=n_chunk, band=_band_for(h, band),
    )
    work_cm = work.transpose(2, 0, 1)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((n_chunk, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_chunk, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * n_chunk, c, k_tiles * k_tile), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(aug, work_cm)
    return _finish_fwd(out, n, k, out_size, c, work.dtype, out_layout)


def _mm_nt(a, b, prec):
    """a @ bᵀ via dot_general contracting axis 1 of both — the MXU-native NT
    form: (H, T), (W, T) -> (H, W) f32."""
    dn = (((1,), (1,)), ((), ()))
    if prec == "highest":
        return jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if prec == "bf16":
        return jax.lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                                   dn, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x, y: jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_lo, b_hi) + dot(a_hi, b_lo)


def _bwd_kernel_multi_T(inv_ref, g_ref, dwork_ref, *, k_tile, out_size,
                        channels, prec, n_chunk):
    """Transposed-layout backward: k_tile stays in LANES (see _fwd_kernel_multi_T).

    dwork[u,v] += Σ_t hat_y[u,t]·hat_x[v,t]·g[t]: the incoming cotangent row
    g_ref[s,c,:] multiplies hat_x along lanes with NO (T,)->(T,1) relayout, and
    the contraction over T runs as the MXU-native NT matmul aT @ gbTᵀ."""
    h, w = dwork_ref.shape[1], dwork_ref.shape[2]
    kt = pl.program_id(1)
    nb = pl.program_id(0)

    @pl.when(jnp.logical_and(nb == 0, kt == 0))
    def _():
        dwork_ref[...] = jnp.zeros_like(dwork_ref)

    u_col = jax.lax.broadcasted_iota(jnp.int32, (h, k_tile), 0).astype(jnp.float32)
    v_col = jax.lax.broadcasted_iota(jnp.int32, (w, k_tile), 0).astype(jnp.float32)
    for s in range(n_chunk):
        sx, sy = _chunk_coords(inv_ref, s, kt, k_tile, out_size, h, w, row=True)
        a_t = jnp.maximum(0.0, 1.0 - jnp.abs(sy - u_col))  # (H, T)
        b_t = jnp.maximum(0.0, 1.0 - jnp.abs(sx - v_col))  # (W, T)
        for c in range(channels):
            gb_t = b_t * g_ref[s, c, :].reshape(1, k_tile)
            dwork_ref[c] += _mm_nt(a_t, gb_t, prec)


def _run_bwd_multi_T(g, inv, modes, work_shape, out_size, interpret, k_tile,
                     prec, n_chunk, out_layout):
    n = inv.shape[0]
    h, w, c = work_shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    n_blocks = pl.cdiv(n, n_chunk)
    pad_n = n_blocks * n_chunk - n
    g_flat = _g_flat(g, n, k, c, out_layout)
    pad_k = k_tiles * k_tile - k
    if pad_k or pad_n:
        g_flat = jnp.pad(g_flat, ((0, pad_n), (0, 0), (0, pad_k)))
    inv, modes = _pad_bank(inv, modes, n_blocks, n_chunk)
    aug = _augment_inv(inv, modes)
    kernel = functools.partial(
        _bwd_kernel_multi_T, k_tile=k_tile, out_size=out_size, channels=c,
        prec=prec, n_chunk=n_chunk,
    )
    dwork = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((n_chunk, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_chunk, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(aug, g_flat)
    return dwork.transpose(1, 2, 0)


# default row band for the transposed BACKWARD kernel: unlike the fwd, the
# bwd's hat-y build + NT matmul dominate its runtime, and banding them is a
# measured win on v5e (5.33 -> 4.32 ms at 48 cuts, identical gradients — the
# excluded hat rows are exactly zero).  0 disables.
WARP_BWD_BAND = int(os.environ.get("PIXRAY_TPU_WARP_BWD_BAND", "64"))


def _run_bwd_multi(g, inv, modes, work_shape, out_size, interpret, k_tile, prec,
                   n_chunk, band, out_layout):
    fwd_prec = prec
    prec = _norm_prec(prec)
    if os.environ.get("PIXRAY_TPU_WARP_BWDT", "1") != "0":
        band_eff = _band_for(work_shape[0], band or WARP_BWD_BAND)
        if band_eff:
            # the int8 backward rung exists only on this (default) kernel and
            # only when the forward already runs int8 — the quantization-error
            # budget is argued jointly (see WARP_BWD_PREC).
            if fwd_prec == "int8" and WARP_BWD_PREC == "int8":
                prec = "int8"
            return _run_bwd_multi_TB(g, inv, modes, work_shape, out_size,
                                     interpret, k_tile, prec, n_chunk, band_eff,
                                     out_layout)
        return _run_bwd_multi_T(g, inv, modes, work_shape, out_size, interpret,
                                k_tile, prec, n_chunk, out_layout)
    n = inv.shape[0]
    h, w, c = work_shape
    k = out_size * out_size
    k_tiles = pl.cdiv(k, k_tile)
    n_blocks = pl.cdiv(n, n_chunk)
    pad_n = n_blocks * n_chunk - n
    g_flat = _g_flat(g, n, k, c, out_layout)
    pad_k = k_tiles * k_tile - k
    if pad_k or pad_n:
        g_flat = jnp.pad(g_flat, ((0, pad_n), (0, 0), (0, pad_k)))
    inv, modes = _pad_bank(inv, modes, n_blocks, n_chunk)
    aug = _augment_inv(inv, modes)
    kernel = functools.partial(
        _bwd_kernel_multi, k_tile=k_tile, out_size=out_size, channels=c,
        prec=prec, n_chunk=n_chunk, band=_band_for(h, band),
    )
    dwork = pl.pallas_call(
        kernel,
        grid=(n_blocks, k_tiles),
        in_specs=[
            pl.BlockSpec((n_chunk, 4, 3), lambda i, t: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_chunk, c, k_tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, h, w), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(aug, g_flat)
    return dwork.transpose(1, 2, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def pallas_warp_modes(work, inv, modes, fill, out_size, interpret, k_tile, prec,
                      n_chunk, band, out_layout):
    return _run_fwd_multi(work, inv, modes, fill, out_size, interpret, k_tile,
                          prec, n_chunk, band, out_layout)


def _pallas_warp_modes_fwd(work, inv, modes, fill, out_size, interpret, k_tile,
                           prec, n_chunk, band, out_layout):
    out = _run_fwd_multi(work, inv, modes, fill, out_size, interpret, k_tile,
                         prec, n_chunk, band, out_layout)
    return out, (jax.lax.stop_gradient(work), inv, modes)


def _xla_bwd_modes(g, inv, modes, work_shape, out_size):
    """XLA reference adjoint of the mixed-mode warp, from INVERSE matrices.

    Same math as warp_batch._warp_gather_modes_bwd (hat-weight matmul scan),
    used as a P0 bisection arm: unified Pallas forward + this backward isolates
    whether _bwd_kernel_multi is the miscompiling piece."""
    h, w, c = work_shape
    n = inv.shape[0]
    k = out_size * out_size
    u_iota = jnp.arange(h, dtype=jnp.float32)
    v_iota = jnp.arange(w, dtype=jnp.float32)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32),
        jnp.arange(out_size, dtype=jnp.float32),
        indexing="ij",
    )
    dst = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (S, S, 3)

    def one_cutout(dwork, args):
        m, mode, g_n = args
        src = jnp.einsum("hwj,kj->hwk", dst, m, precision=jax.lax.Precision.HIGHEST)
        sx = src[..., 0] / (src[..., 2] + 1e-8)
        sy = src[..., 1] / (src[..., 2] + 1e-8)
        sx, sy = _select_padded(sx, sy, mode, h, w)
        txf = sx.reshape(k)
        tyf = sy.reshape(k)
        gf = g_n.reshape(k, c).astype(jnp.float32)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(tyf[:, None] - u_iota[None, :]))  # (K, H)
        b = jnp.maximum(0.0, 1.0 - jnp.abs(txf[:, None] - v_iota[None, :]))  # (K, W)
        ag = jnp.einsum("ku,kc->ukc", a, gf, preferred_element_type=jnp.float32)
        contrib = jnp.einsum("ukc,kv->uvc", ag, b, preferred_element_type=jnp.float32)
        return dwork + contrib, None

    dwork0 = jnp.zeros((h, w, c), jnp.float32)
    g_f = g.reshape(n, out_size, out_size, c).astype(jnp.float32)
    dwork, _ = jax.lax.scan(
        one_cutout, dwork0, (inv, modes.astype(jnp.float32), g_f)
    )
    return dwork


def _pallas_warp_modes_bwd(out_size, interpret, k_tile, prec, n_chunk, band,
                           out_layout, res, g):
    work_ref, inv, modes = res
    if os.environ.get("PIXRAY_TPU_UNIFIED_BARRIER") == "1":
        # P0 bisection arm: fence the kernel's operands from XLA's surrounding
        # fusion/buffer-reuse decisions (suspected full-graph-only miscompile)
        g, inv, modes = jax.lax.optimization_barrier((g, inv, modes))
    if os.environ.get("PIXRAY_TPU_UNIFIED_BWD") == "xla":
        g_nhwc = g.transpose(0, 2, 3, 1) if out_layout == "nchw" else g
        dwork = _xla_bwd_modes(g_nhwc, inv, modes, work_ref.shape, out_size)
    else:
        dwork = _run_bwd_multi(g, inv, modes, work_ref.shape, out_size, interpret,
                               k_tile, prec, n_chunk, band, out_layout)
    return dwork.astype(work_ref.dtype), None, None, None


pallas_warp_modes.defvjp(_pallas_warp_modes_fwd, _pallas_warp_modes_bwd)


def pallas_warp_batch_modes(work, matrices, modes, out_size: int, fill_value=0.0,
                            fill_mask=None, interpret=False, k_tile=None,
                            precision=None, n_chunk=None, band=None,
                            out_layout="nhwc"):
    """Render a mixed-mode cutout bank in ONE kernel launch.

    ``modes``: (N,) int32 per-matrix padding mode (0=reflection, 1=border,
    2=zeros).  ``fill_mask``: optional (N,) bool — cuts whose zeros-padding is
    composited over ``fill_value`` using the closed-form bilinear coverage
    (the reference's random-gray wide-cut fill); the composite runs INSIDE the
    kernel (MODE_FILL) so no full-bank elementwise pass happens outside.
    ``out_layout``: 'nhwc' (N, S, S, C) or 'nchw' (N, C, S, S) — the kernel's
    native channel-major layout, skipping the bank relayout in both passes."""
    k_tile = K_TILE if k_tile is None else k_tile
    precision = WARP_PREC if precision is None else precision
    n_chunk = N_CHUNK if n_chunk is None else n_chunk
    band = WARP_BAND if band is None else band
    inv = jax.vmap(inv3x3)(matrices).astype(jnp.float32)
    fill = None
    if fill_mask is not None:
        modes = jnp.where(fill_mask, MODE_FILL, modes.astype(jnp.int32))
        fill = jnp.asarray(fill_value, jnp.float32)
    return pallas_warp_modes(work, inv, modes, fill, out_size, interpret, k_tile,
                             precision, n_chunk, band, out_layout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def pallas_warp(work, inv_matrices, out_size, padding_mode, interpret, k_tile, prec, band):
    return _run_fwd(work, inv_matrices, out_size, padding_mode, interpret, k_tile, prec, band)


def _pallas_warp_fwd(work, inv_matrices, out_size, padding_mode, interpret, k_tile, prec, band):
    out = _run_fwd(work, inv_matrices, out_size, padding_mode, interpret, k_tile, prec, band)
    return out, (jax.lax.stop_gradient(work), inv_matrices)


def _pallas_warp_bwd(out_size, padding_mode, interpret, k_tile, prec, band, res, g):
    work_ref, inv_matrices = res
    dwork = _run_bwd(g, inv_matrices, work_ref.shape, out_size, padding_mode,
                     interpret, k_tile, prec, band)
    return dwork.astype(work_ref.dtype), None


pallas_warp.defvjp(_pallas_warp_fwd, _pallas_warp_bwd)


def pallas_warp_batch(work, matrices, out_size: int, padding_mode="zeros", fill_value=0.0,
                      interpret=False, k_tile=None, precision=None, band=None):
    """Drop-in for ops.warp_batch.warp_batch using the fused Pallas kernel."""
    k_tile = K_TILE if k_tile is None else k_tile
    precision = WARP_PREC if precision is None else precision
    band = WARP_BAND if band is None else band
    inv = jax.vmap(inv3x3)(matrices).astype(jnp.float32)
    out = pallas_warp(work, inv, out_size, padding_mode, interpret, k_tile, precision, band)

    if padding_mode == "fill":
        h, w = work.shape[0], work.shape[1]
        out_hw = (out_size, out_size)

        def cover_of(m):
            sx, sy = _source_coords(m, out_hw, work.dtype)
            # bilinear coverage of the canvas at (sx, sy) in closed form — the
            # sum of in-bounds hat weights is 1 in the interior and ramps to 0
            # across the half-open border band, so warping a ones-canvas (what
            # this used to cost a third Pallas kernel per step) is just:
            cx = jnp.clip(jnp.minimum(sx + 1.0, w - sx), 0.0, 1.0)
            cy = jnp.clip(jnp.minimum(sy + 1.0, h - sy), 0.0, 1.0)
            return cx * cy

        cover = jax.lax.stop_gradient(jax.vmap(cover_of)(matrices))[..., None]
        fill = jnp.asarray(fill_value, work.dtype)
        out = out + (1.0 - cover) * fill
    return out
