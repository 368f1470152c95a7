"""Batched homography warp with a scatter-free (MXU matmul) adjoint.

Autodiff of a gather-based bilinear warp transposes to a scatter-add, which is
the slowest primitive on TPU — profiling showed it dominating the whole
optimization step (~450 ms of a ~580 ms step at 64 cutouts).  ``warp_batch``
keeps the fast vmapped gather FORWARD and installs a custom VJP whose backward
computes the EXACT adjoint as dense contractions against bilinear hat weights:

    out[k]     = Σ_{u,v} A[k,u] · B[k,v] · work[u,v]     (A, B are 2-sparse hats)
    dwork[u,v] = Σ_k     A[k,u] · B[k,v] · g[k]          (two einsums — MXU work)

Hats are rebuilt from the (padding-transformed) sample coordinates inside the
backward, so no large residuals are saved; the per-cutout contraction runs under
lax.scan with bounded memory (~130 MB transient per cutout at 224² × 597-wide).

Padding semantics match ops/warp.py: 'reflection'/'border' transform coordinates
into range (making the hat adjoint exact); 'zeros'/'fill' taps outside the grid
vanish because the hats have no support there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pixray_tpu.ops.warp import _reflect_coord, bilinear_sample, inv3x3


def _source_coords(matrix, out_hw, dtype):
    out_h, out_w = out_hw
    inv = inv3x3(matrix)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=dtype), jnp.arange(out_w, dtype=dtype), indexing="ij"
    )
    dst = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    src = jnp.einsum("hwj,kj->hwk", dst, inv, precision=jax.lax.Precision.HIGHEST)
    sx = src[..., 0] / (src[..., 2] + 1e-8)
    sy = src[..., 1] / (src[..., 2] + 1e-8)
    return sx, sy


def _transform_coords(sx, sy, h, w, padding_mode):
    if padding_mode == "reflection":
        return _reflect_coord(sx, w), _reflect_coord(sy, h)
    if padding_mode == "border":
        return jnp.clip(sx, 0.0, w - 1.0), jnp.clip(sy, 0.0, h - 1.0)
    return sx, sy  # zeros / fill: out-of-grid taps vanish in both passes


def _matmul_dtype():
    """bf16 on accelerators (MXU), fp32 on CPU (no bf16 dot support)."""
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return jnp.float32 if platform == "cpu" else jnp.bfloat16


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp_gather(work, matrices, out_hw, padding_mode):
    """(H, W, C), (N, 3, 3) → (N, out_h, out_w, C). Grads flow to ``work`` only."""
    h, w = work.shape[0], work.shape[1]

    def one(m):
        sx, sy = _source_coords(m, out_hw, work.dtype)
        tx, ty = _transform_coords(sx, sy, h, w, padding_mode)
        return bilinear_sample(work, tx, ty, padding_mode="zeros")

    return jax.vmap(one)(matrices)


def _warp_gather_fwd(work, matrices, out_hw, padding_mode):
    out = _warp_gather(work, matrices, out_hw, padding_mode)
    # the work canvas is small (<1 MB); saving it carries shape+dtype for bwd
    return out, (jax.lax.stop_gradient(work), matrices)


def _warp_gather_bwd(out_hw, padding_mode, res, g):
    work_ref, matrices = res
    (h, w, c), dtype = work_ref.shape, work_ref.dtype
    u_iota = jnp.arange(h, dtype=dtype)
    v_iota = jnp.arange(w, dtype=dtype)
    k = out_hw[0] * out_hw[1]

    def one_cutout(dwork, args):
        m, g_n = args  # g_n: (out_h, out_w, C)
        sx, sy = _source_coords(m, out_hw, dtype)
        tx, ty = _transform_coords(sx, sy, h, w, padding_mode)
        txf = tx.reshape(k)
        tyf = ty.reshape(k)
        gf = g_n.reshape(k, c)
        # bilinear hat weights: 2 nonzeros per row, built by broadcast (no scatter).
        # hats are exact in bf16 when coords are (weights are short sums of coords);
        # the matmuls run bf16 on the MXU with fp32 accumulation.
        a = jnp.maximum(0.0, 1.0 - jnp.abs(tyf[:, None] - u_iota[None, :]))  # (K, H)
        b = jnp.maximum(0.0, 1.0 - jnp.abs(txf[:, None] - v_iota[None, :]))  # (K, W)
        mm = _matmul_dtype()
        a16 = a.astype(mm)
        b16 = b.astype(mm)
        g16 = gf.astype(mm)
        # dwork[u,v,c] = Σ_k a[k,u] b[k,v] g[k,c]
        ag = jnp.einsum("ku,kc->ukc", a16, g16, preferred_element_type=jnp.float32)
        contrib = jnp.einsum(
            "ukc,kv->uvc", ag.astype(mm), b16, preferred_element_type=jnp.float32
        )
        return dwork + contrib.astype(dtype), None

    dwork0 = jnp.zeros((h, w, c), dtype)
    dwork, _ = jax.lax.scan(one_cutout, dwork0, (matrices, g))
    return dwork, None


_warp_gather.defvjp(_warp_gather_fwd, _warp_gather_bwd)


def _select_coords(sx, sy, mode, h, w):
    """Per-cut padding transform with a TRACED mode (0=refl, 1=border, 2=zeros)."""
    is_r = mode == 0
    is_b = mode == 1
    tx = jnp.where(is_r, _reflect_coord(sx, w),
                   jnp.where(is_b, jnp.clip(sx, 0.0, w - 1.0), sx))
    ty = jnp.where(is_r, _reflect_coord(sy, h),
                   jnp.where(is_b, jnp.clip(sy, 0.0, h - 1.0), sy))
    return tx, ty


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _warp_gather_modes(work, matrices, modes, out_hw):
    """Mixed-mode bank warp: per-matrix padding mode (XLA reference path)."""
    h, w = work.shape[0], work.shape[1]

    def one(m, mode):
        sx, sy = _source_coords(m, out_hw, work.dtype)
        tx, ty = _select_coords(sx, sy, mode, h, w)
        return bilinear_sample(work, tx, ty, padding_mode="zeros")

    return jax.vmap(one)(matrices, modes)


def _warp_gather_modes_fwd(work, matrices, modes, out_hw):
    out = _warp_gather_modes(work, matrices, modes, out_hw)
    return out, (jax.lax.stop_gradient(work), matrices, modes)


def _warp_gather_modes_bwd(out_hw, res, g):
    work_ref, matrices, modes = res
    (h, w, c), dtype = work_ref.shape, work_ref.dtype
    u_iota = jnp.arange(h, dtype=dtype)
    v_iota = jnp.arange(w, dtype=dtype)
    k = out_hw[0] * out_hw[1]

    def one_cutout(dwork, args):
        m, mode, g_n = args
        sx, sy = _source_coords(m, out_hw, dtype)
        tx, ty = _select_coords(sx, sy, mode, h, w)
        txf = tx.reshape(k)
        tyf = ty.reshape(k)
        gf = g_n.reshape(k, c)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(tyf[:, None] - u_iota[None, :]))
        b = jnp.maximum(0.0, 1.0 - jnp.abs(txf[:, None] - v_iota[None, :]))
        mm = _matmul_dtype()
        ag = jnp.einsum("ku,kc->ukc", a.astype(mm), gf.astype(mm),
                        preferred_element_type=jnp.float32)
        contrib = jnp.einsum("ukc,kv->uvc", ag.astype(mm), b.astype(mm),
                             preferred_element_type=jnp.float32)
        return dwork + contrib.astype(dtype), None

    dwork0 = jnp.zeros((h, w, c), dtype)
    dwork, _ = jax.lax.scan(one_cutout, dwork0, (matrices, modes, g))
    return dwork, None, None


_warp_gather_modes.defvjp(_warp_gather_modes_fwd, _warp_gather_modes_bwd)


def warp_batch_modes(work, matrices, modes, out_size: int, fill_value=0.0,
                     fill_mask=None, out_layout="nhwc"):
    """Mixed-mode bank warp with the closed-form fill compositing.

    XLA twin of ops/pallas_warp.py::pallas_warp_batch_modes (same semantics:
    fill cuts composite as ``out + (1-cover)*fill`` — the warp output is zero
    wherever cover is, since every bilinear hat vanishes there)."""
    out_hw = (out_size, out_size)
    out = _warp_gather_modes(work, matrices, modes, out_hw)
    if fill_mask is not None:
        h, w = work.shape[0], work.shape[1]

        def cover_of(m):
            sx, sy = _source_coords(m, out_hw, work.dtype)
            cx = jnp.clip(jnp.minimum(sx + 1.0, w - sx), 0.0, 1.0)
            cy = jnp.clip(jnp.minimum(sy + 1.0, h - sy), 0.0, 1.0)
            return cx * cy

        cover = jax.lax.stop_gradient(jax.vmap(cover_of)(matrices))[..., None]
        fill = jnp.asarray(fill_value, work.dtype)
        out = jnp.where(
            fill_mask[:, None, None, None], out + (1.0 - cover) * fill, out
        )
    if out_layout == "nchw":
        out = out.transpose(0, 3, 1, 2)
    return out


def warp_batch_separable(work, matrices, modes, out_size: int, fill_value=0.0,
                         fill_mask=None, out_layout="nhwc"):
    """Axis-aligned bank warp as two dense matmuls per cut (MXU fast path).

    ``matrices`` must be axis-aligned src→dst (m01=m10=m20=m21=0): the source
    coordinate of output pixel (i, j) then factorizes as (sy(i), sx(j)) and
    the bilinear warp is EXACTLY  out[n] = Ay[n] @ work @ Bx[n]^T  with dense
    2-sparse hat operators — ~100x fewer FLOPs than the dense-homography hat
    contraction (the hats are (S, H) instead of (S*S, H)).  Gradients flow
    through plain matmuls: XLA's native AD adjoint, no scatter, no custom VJP.

    Semantics match warp_batch_modes bit-for-bit on such matrices: per-cut
    padding modes (0=refl, 1=border, 2=zeros) transform the 1-D coordinate
    vectors, and ``fill_mask`` cuts composite toward ``fill_value`` via the
    separable closed-form coverage product.
    """
    h, w, c = work.shape
    dtype = work.dtype
    inv = jax.vmap(inv3x3)(matrices)
    idx = jnp.arange(out_size, dtype=dtype)
    denom = inv[:, 2, 2, None] + 1e-8  # matches _source_coords' homogeneous divide
    sx = (inv[:, 0, 0, None] * idx[None, :] + inv[:, 0, 2, None]) / denom  # (N, S)
    sy = (inv[:, 1, 1, None] * idx[None, :] + inv[:, 1, 2, None]) / denom  # (N, S)
    tx, ty = _select_coords(sx, sy, modes[:, None], h, w)
    u = jnp.arange(h, dtype=dtype)
    v = jnp.arange(w, dtype=dtype)
    ay = jnp.maximum(0.0, 1.0 - jnp.abs(ty[:, :, None] - u[None, None, :]))  # (N,S,H)
    bx = jnp.maximum(0.0, 1.0 - jnp.abs(tx[:, :, None] - v[None, None, :]))  # (N,S,W)
    mm = _matmul_dtype()
    if out_layout == "nchw":
        tmp = jnp.einsum("niu,uvc->ncvi", ay.astype(mm), work.astype(mm),
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("ncvi,njv->ncij", tmp.astype(mm), bx.astype(mm),
                         preferred_element_type=jnp.float32).astype(dtype)
        if fill_mask is not None:
            cx = jnp.clip(jnp.minimum(sx + 1.0, w - sx), 0.0, 1.0)
            cy = jnp.clip(jnp.minimum(sy + 1.0, h - sy), 0.0, 1.0)
            cover = jax.lax.stop_gradient(cy[:, :, None] * cx[:, None, :])[:, None]
            fill = jnp.asarray(fill_value, dtype)
            out = jnp.where(
                fill_mask[:, None, None, None], out + (1.0 - cover) * fill, out
            )
        return out
    tmp = jnp.einsum("niu,uvc->nivc", ay.astype(mm), work.astype(mm),
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nivc,njv->nijc", tmp.astype(mm), bx.astype(mm),
                     preferred_element_type=jnp.float32).astype(dtype)
    if fill_mask is not None:
        cx = jnp.clip(jnp.minimum(sx + 1.0, w - sx), 0.0, 1.0)
        cy = jnp.clip(jnp.minimum(sy + 1.0, h - sy), 0.0, 1.0)
        cover = jax.lax.stop_gradient(cy[:, :, None] * cx[:, None, :])[..., None]
        fill = jnp.asarray(fill_value, dtype)
        out = jnp.where(
            fill_mask[:, None, None, None], out + (1.0 - cover) * fill, out
        )
    return out


def warp_batch(work, matrices, out_size: int, padding_mode="zeros", fill_value=0.0):
    """Warp a bank of N homographies out of one canvas with a matmul adjoint.

    work: (H, W, C); matrices: (N, 3, 3) src→dst.  Returns (N, S, S, C).
    'fill' blends toward fill_value outside the source extent, matching the
    ops/warp.py fill path (coverage from sampling a constant image).
    """
    out_hw = (out_size, out_size)
    out = _warp_gather(work, matrices, out_hw, padding_mode)

    if padding_mode == "fill":
        h, w = work.shape[0], work.shape[1]

        def cover_of(m):
            # closed-form bilinear coverage: identical to warping a ones-canvas
            # (the hat weights factorize per axis), shared with the unified
            # mixed-mode paths so all fill formulations agree bit-for-bit
            sx, sy = _source_coords(m, out_hw, work.dtype)
            cx = jnp.clip(jnp.minimum(sx + 1.0, w - sx), 0.0, 1.0)
            cy = jnp.clip(jnp.minimum(sy + 1.0, h - sy), 0.0, 1.0)
            return cx * cy

        cover = jax.lax.stop_gradient(jax.vmap(cover_of)(matrices))[..., None]
        fill = jnp.asarray(fill_value, work.dtype)
        out = out + (1.0 - cover) * fill
    return out
