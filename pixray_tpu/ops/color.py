"""Color-space ops: RGB↔HSV and the hue/saturation jitter used by the cutout
pipeline (kornia ColorJitter(hue=0.1, saturation=0.1) equivalent;
/root/reference/pixray.py:416, 436).  All ops are differentiable and vectorized
over arbitrary leading dims.

The HSV round-trip is implemented once in PLANE form (:func:`_jitter_planes`,
separate r/g/b arrays) and wrapped for both layouts: channels-last stacks
(:func:`adjust_hue_saturation` / :func:`random_color_jitter`) and the engine's
channel-major cutout banks (:func:`random_color_jitter_nchw`).  Plane form
matters on TPU: slicing/stacking a channels-last (..., 3) array materializes
awkward (..., 1)-shaped layouts between every HSV stage, which fragmented the
jitter into a dozen separate HBM passes in profiles; the plane math keeps each
(N, H, W) array in its native layout end-to-end and XLA fuses the whole
round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    h, s, v = _rgb_to_hsv_planes(r, g, b)
    return jnp.stack([h, s, v], axis=-1)


def _rgb_to_hsv_planes(r, g, b):
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    # double-where: a plain `where(cond, x/d, 0)` still differentiates the
    # UNTAKEN branch, and its 1/d² cotangent terms go Inf/NaN at gray pixels
    # (d -> 0; guaranteed to occur on bf16-quantized cutouts and constant
    # fills).  Substituting a safe denominator BEFORE the division keeps both
    # passes finite with exactly-zero gradients on the degenerate set.
    gray = delta <= 1e-6
    dark = maxc <= 1e-6
    s = jnp.where(dark, 0.0, delta / jnp.where(dark, 1.0, maxc))

    safe_delta = jnp.where(gray, 1.0, delta)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(gray, 0.0, (h / 6.0) % 1.0)
    return h, s, v


def hsv_to_rgb(hsv):
    r, g, b = _hsv_to_rgb_planes(hsv[..., 0], hsv[..., 1], hsv[..., 2])
    return jnp.stack([r, g, b], axis=-1)


def _hsv_to_rgb_planes(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return r, g, b


def _jitter_planes(r, g, b, hue_shift, sat_factor):
    """Hue/sat adjust on separate channel planes; f32 internal math.

    bf16 quantization makes near-gray ties pervasive, and the HSV round-trip's
    divisions need the f32 epsilons to stay stable; outputs return in the
    input dtype."""
    dtype = r.dtype
    rf = jnp.clip(r.astype(jnp.float32), 0.0, 1.0)
    gf = jnp.clip(g.astype(jnp.float32), 0.0, 1.0)
    bf = jnp.clip(b.astype(jnp.float32), 0.0, 1.0)
    h, s, v = _rgb_to_hsv_planes(rf, gf, bf)
    h = (h + hue_shift) % 1.0
    s = jnp.clip(s * sat_factor, 0.0, 1.0)
    ro, go, bo = _hsv_to_rgb_planes(h, s, v)
    return ro.astype(dtype), go.astype(dtype), bo.astype(dtype)


def adjust_hue_saturation(img, hue_shift, sat_factor):
    """Shift hue by ``hue_shift`` (fraction of the hue circle) and scale
    saturation.  Channels-last; same math as :func:`_jitter_planes`."""
    r, g, b = _jitter_planes(img[..., 0], img[..., 1], img[..., 2], hue_shift, sat_factor)
    return jnp.stack([r, g, b], axis=-1)


def _draw_jitter_params(key, hue, saturation, p):
    k_apply, k_hue, k_sat = jax.random.split(key, 3)
    hue_shift = jax.random.uniform(k_hue, (), minval=-hue, maxval=hue)
    sat_factor = jax.random.uniform(
        k_sat, (), minval=jnp.maximum(0.0, 1.0 - saturation), maxval=1.0 + saturation
    )
    return hue_shift, sat_factor, jax.random.bernoulli(k_apply, p)


def random_color_jitter(key, img, hue=0.1, saturation=0.1, p=0.8):
    """Per-image random hue/saturation jitter applied with probability ``p``."""
    hue_shift, sat_factor, apply = _draw_jitter_params(key, hue, saturation, p)
    jittered = adjust_hue_saturation(img, hue_shift, sat_factor)
    return jnp.where(apply, jittered, img)


def random_color_jitter_nchw(keys, batch, hue=0.1, saturation=0.1, p=0.8):
    """Bank jitter for channel-major batches: (N,) keys, (N, 3, H, W) batch.

    Identical per-image values to ``vmap(random_color_jitter)`` on the
    channels-last transpose (same key→parameter mapping, same plane math) —
    the layout is the only difference."""
    r, g, b = random_color_jitter_planes(
        keys, batch[:, 0], batch[:, 1], batch[:, 2], hue=hue, saturation=saturation, p=p
    )
    return jnp.stack([r, g, b], axis=1)


def random_color_jitter_planes(keys, r, g, b, hue=0.1, saturation=0.1, p=0.8):
    """Plane-form bank jitter: (N,) keys, three (N, H, W) channel planes in,
    three planes out.  Same per-image parameter draws and plane math as
    :func:`random_color_jitter_nchw`; staying in plane form lets the caller
    keep the whole post-warp epilogue (jitter select + noise) as per-plane
    elementwise chains that XLA fuses into the final channel stack, instead
    of paying separate full-bank passes for stack → select → noise."""
    hs, sf, apply = jax.vmap(
        lambda k: _draw_jitter_params(k, hue, saturation, p)
    )(keys)
    hs = hs[:, None, None]
    sf = sf[:, None, None]
    ap = apply[:, None, None]
    ro, go, bo = _jitter_planes(r, g, b, hs, sf)
    return (
        jnp.where(ap, ro, r),
        jnp.where(ap, go, g),
        jnp.where(ap, bo, b),
    )
