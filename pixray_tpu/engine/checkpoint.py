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

# Bump when the saved-state layout changes; restore refuses other versions.
SCHEMA_VERSION = 2


def _repo_version() -> str:
    try:
        import pixray_tpu

        return getattr(pixray_tpu, "__version__", "unknown")
    except Exception:
        return "unknown"


def save_session(path: str, engine) -> None:
    """Persist the engine's resumable state to ``path``."""
    state = {
        "schema_version": SCHEMA_VERSION,
        "jax_version": jax.__version__,
        "repo_version": _repo_version(),
        "drawer": type(engine.drawer).__name__,
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

    got = state.get("schema_version")
    if got != SCHEMA_VERSION:
        raise ValueError(
            f"checkpoint schema mismatch: file has version {got!r} "
            f"(saved by repo {state.get('repo_version', '?')}, jax "
            f"{state.get('jax_version', '?')}), this build expects "
            f"{SCHEMA_VERSION}. Re-render or convert the session."
        )
    want_drawer = type(engine.drawer).__name__
    if state.get("drawer", want_drawer) != want_drawer:
        raise ValueError(
            f"checkpoint was saved with drawer {state['drawer']!r} but the "
            f"engine is configured with {want_drawer!r} — restore with the "
            "same --drawer."
        )

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
