"""Session checkpoint/resume: (latent, optimizer state, PRNG key, iteration).

The reference has NO run checkpointing (SURVEY.md §5: only weight-download
caching and provenance PNGs).  Here a session can be saved every N iterations
and resumed exactly.

Format: pytree LEAVES as numpy arrays + scalar metadata, restored by unflattening
against the live engine's tree structure — this survives optax NamedTuple state
types without custom (de)serializers and stays robust across optimizer choices.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save_session(path: str, engine) -> None:
    """Persist the engine's resumable state to ``path``."""
    state = {
        "z_leaves": [np.asarray(x) for x in jax.tree_util.tree_leaves(engine.z)],
        "opt_leaves": [np.asarray(x) for x in jax.tree_util.tree_leaves(engine.opt_state)],
        "key": np.asarray(engine.key),
        "iteration": engine.cur_iteration,
        "lr_scale": engine.lr_scale,
        "seed_used": engine.seed_used,
        "tracker": {
            "best_loss": engine.tracker.best_loss,
            "best_iter": engine.tracker.best_iter,
            "num_loss_drop": engine.tracker.num_loss_drop,
        },
    }
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f)


def restore_session(path: str, engine) -> int:
    """Restore state saved by save_session into a freshly-initialized engine of
    the same configuration; returns the resumed iteration."""
    with open(path, "rb") as f:
        state = pickle.load(f)

    z_def = jax.tree_util.tree_structure(engine.z)
    opt_def = jax.tree_util.tree_structure(engine.opt_state)
    engine.z = jax.tree_util.tree_unflatten(
        z_def, [jnp.asarray(x) for x in state["z_leaves"]]
    )
    engine.opt_state = jax.tree_util.tree_unflatten(
        opt_def, [jnp.asarray(x) for x in state["opt_leaves"]]
    )
    engine.key = jnp.asarray(state["key"])
    engine.cur_iteration = int(state["iteration"])
    engine.lr_scale = float(state["lr_scale"])
    engine.tracker.best_loss = float(state["tracker"]["best_loss"])
    engine.tracker.best_iter = int(state["tracker"]["best_iter"])
    engine.tracker.num_loss_drop = int(state["tracker"]["num_loss_drop"])
    return engine.cur_iteration
