"""Session checkpoint/resume: (latent, optimizer state, PRNG key, iteration).

The reference has NO run checkpointing (SURVEY.md §5: only weight-download
caching and provenance PNGs).  Here a session can be saved every N iterations
and resumed exactly.

Format: one ``.npz`` (zip of raw numpy arrays, loaded with
``allow_pickle=False`` so restoring an untrusted file can never execute code)
holding the pytree LEAVES plus a ``manifest`` entry — UTF-8 JSON bytes carrying
the schema version, build stamps, drawer name and scalar state.  Leaves are
restored by unflattening against the live engine's tree structure — this
survives optax NamedTuple state types without custom (de)serializers and stays
robust across optimizer choices.
"""

from __future__ import annotations

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

# Bump when the saved-state layout changes; restore refuses other versions.
# v3: pickle container replaced by npz + JSON manifest (restore never unpickles).
SCHEMA_VERSION = 3


def _repo_version() -> str:
    try:
        import pixray_tpu

        return getattr(pixray_tpu, "__version__", "unknown")
    except Exception:
        return "unknown"


def _manifest_bytes(manifest: dict) -> np.ndarray:
    return np.frombuffer(json.dumps(manifest).encode("utf-8"), dtype=np.uint8)


def read_manifest(path: str) -> dict:
    """Parse the JSON manifest of a checkpoint without touching the arrays."""
    with np.load(path, allow_pickle=False) as z:
        if "manifest" not in z.files:
            raise ValueError(
                f"{path!r} is not a pixray_tpu checkpoint (no manifest entry)"
            )
        return json.loads(bytes(z["manifest"]).decode("utf-8"))


def save_session(path: str, engine) -> None:
    """Persist the engine's resumable state to ``path`` (npz, pickle-free)."""
    z_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(engine.z)]
    opt_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(engine.opt_state)]
    manifest = {
        "schema_version": SCHEMA_VERSION,
        "jax_version": jax.__version__,
        "repo_version": _repo_version(),
        "drawer": type(engine.drawer).__name__,
        "n_z_leaves": len(z_leaves),
        "n_opt_leaves": len(opt_leaves),
        "iteration": int(engine.cur_iteration),
        "lr_scale": float(engine.lr_scale),
        "seed_used": engine.seed_used,
        "tracker": {
            "best_loss": float(engine.tracker.best_loss),
            "best_iter": int(engine.tracker.best_iter),
            "num_loss_drop": int(engine.tracker.num_loss_drop),
        },
    }
    arrays = {"manifest": _manifest_bytes(manifest), "key": np.asarray(engine.key)}
    for i, leaf in enumerate(z_leaves):
        arrays[f"z_{i}"] = leaf
    for i, leaf in enumerate(opt_leaves):
        arrays[f"opt_{i}"] = leaf

    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    # write via buffer then one atomic-ish file write (np.savez appends .npz to
    # bare paths; a checkpoint path is user-chosen and must round-trip exactly)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def restore_session(path: str, engine) -> int:
    """Restore state saved by save_session into a freshly-initialized engine of
    the same configuration; returns the resumed iteration.

    Loads with ``allow_pickle=False``: a malicious checkpoint can fail to parse
    but can never run code.
    """
    with np.load(path, allow_pickle=False) as z:
        if "manifest" not in z.files:
            raise ValueError(
                f"{path!r} is not a pixray_tpu checkpoint (no manifest entry)"
            )
        state = json.loads(bytes(z["manifest"]).decode("utf-8"))

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

        z_leaves = [z[f"z_{i}"] for i in range(int(state["n_z_leaves"]))]
        opt_leaves = [z[f"opt_{i}"] for i in range(int(state["n_opt_leaves"]))]
        key = z["key"]

    z_def = jax.tree_util.tree_structure(engine.z)
    opt_def = jax.tree_util.tree_structure(engine.opt_state)
    engine.z = jax.tree_util.tree_unflatten(
        z_def, [jnp.asarray(x) for x in z_leaves]
    )
    engine.opt_state = jax.tree_util.tree_unflatten(
        opt_def, [jnp.asarray(x) for x in opt_leaves]
    )
    engine.key = jnp.asarray(key)
    engine.cur_iteration = int(state["iteration"])
    engine.lr_scale = float(state["lr_scale"])
    engine.tracker.best_loss = float(state["tracker"]["best_loss"])
    engine.tracker.best_iter = int(state["tracker"]["best_iter"])
    engine.tracker.num_loss_drop = int(state["tracker"]["num_loss_drop"])
    return engine.cur_iteration
