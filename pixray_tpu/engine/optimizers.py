"""Optimizer suite: Adam, AdamW, Adagrad, Adamax, DiffGrad, AdamP on optax.

Parity with the reference's optimiser table (/root/reference/pixray.py:536-553,
torch_optimizer DiffGrad/AdamP).  All optimizers are wrapped with
``optax.inject_hyperparams`` so the LR-drop schedule (pixray.py:1496-1511) is a
state update, not a recompile.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class DiffGradState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    prev_grad: optax.Updates


def scale_by_diffgrad(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """DiffGrad: Adam scaled by a 'friction' sigmoid of the gradient change.

    update = m_hat * sigmoid(|g_prev - g|) / (sqrt(v_hat) + eps)
    """

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return DiffGradState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            prev_grad=zeros,
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu = optax.tree_utils.tree_update_moment(updates, state.mu, b1, 1)
        nu = optax.tree_utils.tree_update_moment_per_elem_norm(updates, state.nu, b2, 2)
        mu_hat = optax.tree_utils.tree_bias_correction(mu, b1, count)
        nu_hat = optax.tree_utils.tree_bias_correction(nu, b2, count)

        def one(m, v, g, g_prev):
            # positive ascent direction; optax.scale_by_learning_rate negates
            dfc = jax.nn.sigmoid(jnp.abs(g_prev - g))
            return m * dfc / (jnp.sqrt(v) + eps)

        new_updates = jax.tree_util.tree_map(one, mu_hat, nu_hat, updates, state.prev_grad)
        return new_updates, DiffGradState(count=count, mu=mu, nu=nu, prev_grad=updates)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_adamp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, delta: float = 0.1):
    """AdamP-style update: Adam step with the radial component projected out for
    scale-invariant-looking parameters (cosine(g, p) below threshold)."""

    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init_fn(params):
        return adam.init(params)

    def update_fn(updates, state, params=None):
        steps, state = adam.update(updates, state, params)
        if params is None:
            return steps, state

        def project(step, p):
            if p.ndim == 0:
                return step
            p_flat = p.reshape(-1)
            s_flat = step.reshape(-1)
            p_norm = jnp.linalg.norm(p_flat) + eps
            cos = jnp.abs(jnp.vdot(p_flat / p_norm, s_flat / (jnp.linalg.norm(s_flat) + eps)))
            radial = jnp.vdot(p_flat, s_flat) / (p_norm**2)
            projected = s_flat - radial * p_flat
            use_proj = cos < (delta / jnp.sqrt(p_flat.size))
            return jnp.where(use_proj, projected, s_flat).reshape(step.shape)

        steps = jax.tree_util.tree_map(project, steps, params)
        return steps, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    """Named optimizer with an injectable learning rate (see drop_lr)."""

    def make(learning_rate):
        if name == "Adam":
            return optax.adam(learning_rate)
        if name == "AdamW":
            return optax.adamw(learning_rate)
        if name == "Adagrad":
            return optax.adagrad(learning_rate)
        if name == "Adamax":
            return optax.adamax(learning_rate)
        if name == "DiffGrad":
            return optax.chain(
                scale_by_diffgrad(), optax.scale_by_learning_rate(learning_rate)
            )
        if name == "AdamP":
            return optax.chain(
                scale_by_adamp(), optax.scale_by_learning_rate(learning_rate)
            )
        raise ValueError(f"Unknown optimiser: {name}")

    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def set_learning_rate(opt_state, learning_rate: float):
    """Update the injected learning rate in-place (no recompilation)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        learning_rate, dtype=opt_state.hyperparams["learning_rate"].dtype
    )
    return opt_state
