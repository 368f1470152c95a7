"""Color-space ops: RGB↔HSV and the hue/saturation jitter used by the cutout
pipeline (kornia ColorJitter(hue=0.1, saturation=0.1) equivalent;
/root/reference/pixray.py:416, 436).  All ops are differentiable and vectorized
over arbitrary leading dims; channels last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
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
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue_saturation(img, hue_shift, sat_factor):
    """Shift hue by ``hue_shift`` (fraction of the hue circle) and scale saturation.

    Internal math runs in f32 regardless of the input dtype: bf16 quantization
    makes near-gray ties pervasive, and the HSV round-trip's divisions need the
    f32 epsilons to stay stable (output returns in the input dtype)."""
    dtype = img.dtype
    hsv = rgb_to_hsv(jnp.clip(img.astype(jnp.float32), 0.0, 1.0))
    h = (hsv[..., 0] + hue_shift) % 1.0
    s = jnp.clip(hsv[..., 1] * sat_factor, 0.0, 1.0)
    adjusted = hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))
    return adjusted.astype(dtype)


def random_color_jitter(key, img, hue=0.1, saturation=0.1, p=0.8):
    """Per-image random hue/saturation jitter applied with probability ``p``."""
    k_apply, k_hue, k_sat = jax.random.split(key, 3)
    hue_shift = jax.random.uniform(k_hue, (), minval=-hue, maxval=hue)
    sat_factor = jax.random.uniform(
        k_sat, (), minval=jnp.maximum(0.0, 1.0 - saturation), maxval=1.0 + saturation
    )
    jittered = adjust_hue_saturation(img, hue_shift, sat_factor)
    return jnp.where(jax.random.bernoulli(k_apply, p), jittered, img)
