"""Adaptive average / max pooling (NHWC), torch-semantics, TPU-friendly.

Replaces the ``AdaptiveAvgPool2d``/``AdaptiveMaxPool2d`` pair feeding the cutout
pipeline (/root/reference/pixray.py:442-443, 463).  Torch adaptive pooling uses
variable-size windows ``[floor(i*In/Out), ceil((i+1)*In/Out))``; we realize this
with a static gather of padded windows + masked reduction, which XLA fuses well
and which keeps every shape static under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _window_bounds(in_size: int, out_size: int):
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int32)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(np.int32)
    return starts, ends


def _gather_windows(x, out_h: int, out_w: int):
    """Gather (H_out, W_out, kh, kw) windows from an (H, W, C) image, with mask."""
    h, w = x.shape[0], x.shape[1]
    ys, ye = _window_bounds(h, out_h)
    xs, xe = _window_bounds(w, out_w)
    kh = int((ye - ys).max())
    kw = int((xe - xs).max())

    row_idx = ys[:, None] + np.arange(kh)[None, :]  # (out_h, kh)
    col_idx = xs[:, None] + np.arange(kw)[None, :]  # (out_w, kw)
    row_mask = row_idx < ye[:, None]
    col_mask = col_idx < xe[:, None]
    row_idx = np.minimum(row_idx, h - 1)
    col_idx = np.minimum(col_idx, w - 1)

    # (out_h, kh, W, C) -> (out_h, kh, out_w, kw, C)
    rows = x[row_idx.reshape(-1)].reshape(out_h, kh, w, -1)
    wins = rows[:, :, col_idx.reshape(-1)].reshape(out_h, kh, out_w, kw, -1)
    mask = (row_mask[:, :, None, None] & col_mask[None, None, :, :])[..., None]
    return wins, jnp.asarray(mask)


def _avg_pool_matrix(in_size: int, out_size: int):
    """(out, in) row-stochastic matrix realizing torch adaptive average pooling.

    Average pooling is a fixed linear map — expressing it as a dense matmul puts
    both the forward and the adjoint on the MXU (no gathers, no scatters)."""
    starts, ends = _window_bounds(in_size, out_size)
    cols = np.arange(in_size)
    member = (cols[None, :] >= starts[:, None]) & (cols[None, :] < ends[:, None])
    mat = member.astype(np.float32)
    return mat / mat.sum(axis=1, keepdims=True)


@partial(jax.jit, static_argnums=(1, 2))
def adaptive_avg_pool(x, out_h: int, out_w: int):
    """Torch-style adaptive average pool as two matmuls. x: (..., H, W, C)."""
    h, w = x.shape[-3], x.shape[-2]
    row_mat = jnp.asarray(_avg_pool_matrix(h, out_h))  # (out_h, H)
    col_mat = jnp.asarray(_avg_pool_matrix(w, out_w))  # (out_w, W)
    # HIGHEST precision: TPU f32 matmuls default to bf16-grade passes; exact
    # pooling keeps parity with the reference's fp32 adaptive pooling
    y = jnp.einsum("oh,...hwc->...owc", row_mat, x,
                   preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", col_mat, y,
                   preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def _nearest_matrix(in_size: int, out_size: int):
    """(out, in) 0/1 matrix realizing nearest-neighbor resampling (jax.image
    'nearest' convention: src = floor((i + 0.5) * in/out))."""
    src = np.floor((np.arange(out_size) + 0.5) * in_size / out_size).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


@partial(jax.jit, static_argnums=(1, 2))
def nearest_resize(x, out_h: int, out_w: int):
    """Nearest-neighbor resize as two 0/1 matmuls. x: (..., H, W, C).

    jax.image.resize('nearest') is a gather whose TRANSPOSE is a scatter-add —
    the slowest TPU primitive; as matmuls both directions run on the MXU."""
    h, w = x.shape[-3], x.shape[-2]
    row_mat = jnp.asarray(_nearest_matrix(h, out_h))
    col_mat = jnp.asarray(_nearest_matrix(w, out_w))
    y = jnp.einsum("oh,...hwc->...owc", row_mat, x,
                   preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", col_mat, y,
                   preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


@partial(jax.jit, static_argnums=(1, 2))
def adaptive_max_pool(x, out_h: int, out_w: int):
    """Torch-style adaptive max pool. x: (..., H, W, C)."""
    def one(img):
        wins, mask = _gather_windows(img, out_h, out_w)
        neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
        return jnp.max(jnp.where(mask, wins, neg), axis=(1, 3))

    batch_shape = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    out = jax.vmap(one)(flat)
    return out.reshape(batch_shape + out.shape[1:])
