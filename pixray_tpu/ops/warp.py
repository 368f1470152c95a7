"""Differentiable homography/affine warping with torch-style padding modes.

TPU-native replacement for the kornia warp stack driving the reference's cutout
augmentations (/root/reference/pixray.py:326-366, 400-511).  Design departure from
the reference: instead of chaining separate perspective/crop/affine resampling
passes, every augmentation is expressed as a 3x3 matrix and **composed**, so each
cutout is produced by exactly ONE bilinear gather — fewer resampling artifacts and
one memory-bound pass instead of three.  (The reference itself does this on its
cached-transform path, pixray.py:480-486.)

Conventions: images are (H, W, C) float; matrices map SOURCE pixel-center
coordinates to DESTINATION pixel-center coordinates (kornia convention); warping
inverts once.  ``padding_mode`` ∈ {'zeros', 'border', 'reflection', 'fill'}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mm3(a, b):
    """Small-matrix product at HIGHEST precision.

    TPU f32 matmuls default to bf16-grade passes; transform matrices amplify that
    to ~0.5-pixel coordinate errors (found via tools/crosscheck), so all 3x3
    composition/coordinate math runs exact."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def _reflect_coord(x, size):
    """Reflect out-of-range coords about pixel-edge boundaries (-0.5, size-0.5)."""
    span = 2.0 * size
    x = jnp.mod(x + 0.5, span)
    x = jnp.where(x >= size, span - x - 1e-6, x)
    return x - 0.5


def bilinear_sample(img, x, y, padding_mode="zeros", fill_value=0.0):
    """Differentiable bilinear sampling of (H, W, C) at continuous (x, y).

    x, y may have any (matching) shape; returns shape x.shape + (C,).
    """
    h, w = img.shape[0], img.shape[1]

    if padding_mode == "reflection":
        x = _reflect_coord(x, w)
        y = _reflect_coord(y, h)
    elif padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = img[yi_c, xi_c]  # gather, shape x.shape + (C,)
        return jnp.where(valid[..., None], vals, 0.0), valid

    v00, m00 = tap(y0i, x0i)
    v01, m01 = tap(y0i, x0i + 1)
    v10, m10 = tap(y0i + 1, x0i)
    v11, m11 = tap(y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )

    if padding_mode == "fill":
        fill = jnp.asarray(fill_value, dtype=img.dtype)
        fill = jnp.broadcast_to(fill, out.shape)
        # blend partial-coverage taps toward the fill color.  cover is the sum
        # of in-bounds hat weights (1 interior, ramping to 0 across the
        # one-pixel border band); out is already 0 wherever cover is — the
        # same formula every fill path (warp_batch, the unified mixed-mode
        # kernels, the in-kernel Pallas composite) shares bit-for-bit.
        cover = (
            m00.astype(img.dtype)[..., None] * (1 - wx) * (1 - wy)
            + m01.astype(img.dtype)[..., None] * wx * (1 - wy)
            + m10.astype(img.dtype)[..., None] * (1 - wx) * wy
            + m11.astype(img.dtype)[..., None] * wx * wy
        )
        out = out + (1 - cover) * fill
    return out


def warp_perspective(img, matrix, out_hw, padding_mode="zeros", fill_value=0.0):
    """Warp (H, W, C) by a src→dst 3x3 homography into an (out_h, out_w, C) canvas."""
    out_h, out_w = out_hw
    inv = inv3x3(matrix)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=img.dtype), jnp.arange(out_w, dtype=img.dtype), indexing="ij"
    )
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1)  # (out_h, out_w, 3)
    src = jnp.einsum("hwj,kj->hwk", dst, inv, precision=jax.lax.Precision.HIGHEST)
    sx = src[..., 0] / (src[..., 2] + 1e-8)
    sy = src[..., 1] / (src[..., 2] + 1e-8)
    return bilinear_sample(img, sx, sy, padding_mode=padding_mode, fill_value=fill_value)


# ---------------------------------------------------------------------------
# transform builders (all src→dst 3x3, pixel-center coords)
# ---------------------------------------------------------------------------

def inv3x3(m):
    """Closed-form (adjugate) 3x3 inverse — TPU-friendly; jnp.linalg.inv lowers
    to a pivoting LU loop that serializes badly on TPU."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e]),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)]),
        jnp.stack([C, -(a * h - b * g), a * e - b * d]),
    ])
    return adj / det


def _basis_to_quad(pts):
    """3x3 map sending the projective basis to 4 points (x_i, y_i).

    Classic closed form: with Q = [q1 q2 q3] (homogeneous columns), solve
    Q·λ = q4 by adjugate and scale the columns: A = Q·diag(λ)."""
    q = jnp.stack([pts[:, 0], pts[:, 1], jnp.ones_like(pts[:, 0])])  # (3, 4)
    Q = q[:, :3]
    lam = jnp.einsum("ij,j->i", inv3x3(Q), q[:, 3], precision=jax.lax.Precision.HIGHEST)
    return Q * lam[None, :]


def homography_from_points(src_pts, dst_pts):
    """3x3 homography mapping 4 src points to 4 dst points.

    Closed-form projective-basis construction (no linear-system solve):
    H = A_dst · A_src⁻¹ where A_* map the projective basis onto each quad."""
    a_src = _basis_to_quad(src_pts)
    a_dst = _basis_to_quad(dst_pts)
    return mm3(a_dst, inv3x3(a_src))


def random_perspective(key, h, w, distortion_scale):
    """Random 4-corner inward perspective distortion (kornia RandomPerspective family)."""
    corners = jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]]
    )
    inward = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
    mags = jax.random.uniform(key, (4, 2))
    half = jnp.array([w / 2.0, h / 2.0])
    dst = corners + inward * mags * distortion_scale * half
    return homography_from_points(corners, dst)


def random_resized_crop(key, h, w, out_size, scale=(0.25, 0.95), ratio=(0.85, 1.2)):
    """Random area/aspect crop box resized to (out_size, out_size), as one affine."""
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(
        k_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    x0 = jax.random.uniform(k_x, ()) * (w - cw)
    y0 = jax.random.uniform(k_y, ()) * (h - ch)
    return crop_box_transform(x0, y0, cw, ch, out_size, out_size)


def crop_box_transform(x0, y0, cw, ch, out_h, out_w):
    """Affine mapping the source box [x0, x0+cw)×[y0, y0+ch) onto the output canvas."""
    sx = out_w / cw
    sy = out_h / ch
    zero = jnp.zeros_like(sx * 1.0)
    one = jnp.ones_like(sx * 1.0)
    return jnp.stack(
        [
            jnp.stack([sx, zero, -x0 * sx]),
            jnp.stack([zero, sy, -y0 * sy]),
            jnp.stack([zero, zero, one]),
        ]
    )


def center_crop_transform(h, w, size):
    """Static center-crop affine (kornia CenterCrop, cropping_mode='resample')."""
    x0 = (w - size) / 2.0
    y0 = (h - size) / 2.0
    return crop_box_transform(
        jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(float(size)), jnp.asarray(float(size)), size, size
    )


def random_affine(key, h, w, translate, scale_range, degrees=0.0):
    """Random affine about the image center (kornia RandomAffine, degrees=0 path)."""
    k_t, k_s, k_r = jax.random.split(key, 3)
    tx = jax.random.uniform(k_t, (), minval=-translate[0], maxval=translate[0]) * w
    ty = jax.random.uniform(jax.random.fold_in(k_t, 1), (), minval=-translate[1], maxval=translate[1]) * h
    s = jax.random.uniform(k_s, (), minval=scale_range[0], maxval=scale_range[1])
    theta = jnp.deg2rad(
        jax.random.uniform(k_r, (), minval=-degrees, maxval=degrees)
    )
    cos, sin = jnp.cos(theta) * s, jnp.sin(theta) * s
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    # translate to center, rotate+scale, translate back (+jitter)
    return jnp.stack(
        [
            jnp.stack([cos, -sin, cx - cos * cx + sin * cy + tx]),
            jnp.stack([sin, cos, cy - sin * cx - cos * cy + ty]),
            jnp.stack([zero, zero, one]),
        ]
    )


def maybe(key, p, matrix, h=None, w=None):
    """Apply ``matrix`` with probability ``p``, else identity (kornia p= semantics)."""
    apply = jax.random.bernoulli(key, p)
    eye = jnp.eye(3, dtype=matrix.dtype)
    return jnp.where(apply, matrix, eye)
