"""Gradient-shaping primitives used throughout the engine.

JAX ``custom_vjp`` re-designs of the reference's autograd tricks:

- ``replace_grad`` (/root/reference/pixray.py:249-259): forward one value, route
  gradients to another (the prompt stop-threshold trick).
- ``clamp_with_grad`` (/root/reference/vqgan.py:66-79): clamp whose backward only
  zeroes gradient components that push further out of range.
- ``spherical_dist_loss`` (/root/reference/pixray.py:262-265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def replace_grad(x_forward, x_backward):
    return x_forward


def _replace_grad_fwd(x_forward, x_backward):
    return x_forward, x_backward.shape


def _replace_grad_bwd(shape, g):
    # sum the cotangent down to the backward operand's shape (broadcast adjoint)
    extra = g.ndim - len(shape)
    reduce_axes = tuple(range(extra)) + tuple(
        i + extra for i, s in enumerate(shape) if g.shape[i + extra] != s
    )
    summed = jnp.sum(g, axis=reduce_axes, keepdims=False)
    return None, summed.reshape(shape)


replace_grad.defvjp(_replace_grad_fwd, _replace_grad_bwd)


@jax.custom_vjp
def clamp_with_grad(x, lo, hi):
    return jnp.clip(x, lo, hi)


def _clamp_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), (x, lo, hi)


def _clamp_bwd(res, g):
    x, lo, hi = res
    # pass gradient only where it does not push the value further outside [lo, hi]
    keep = (g * (x - jnp.clip(x, lo, hi)) >= 0).astype(g.dtype)
    return g * keep, None, None


clamp_with_grad.defvjp(_clamp_fwd, _clamp_bwd)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def spherical_dist_loss(x, y):
    """Squared great-circle distance between unit-normalized embeddings."""
    x = l2_normalize(x, axis=-1)
    y = l2_normalize(y, axis=-1)
    chord = jnp.linalg.norm(x - y, axis=-1)
    return jnp.square(jnp.arcsin(chord / 2)) * 2
