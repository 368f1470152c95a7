"""Full sharded training steps on an arbitrary mesh, for dry runs and parity.

Shared by the driver's ``dryrun_multichip`` entry (virtual single-process CPU
mesh), the multi-host test harness (two OS processes joined over
``jax.distributed`` with a DCN data axis), and the on-TPU mesh smoke
(tools/tpu_mesh_smoke.py) — all validate that the flagship step's
tp(weights)/dp(cutouts)/ensemble sharding surface compiles and executes on the
given mesh.  ``run_parity`` goes further: it runs the SAME seeded multi-step
trajectory sharded and unsharded and asserts the losses and the final latent
agree — sharding must be a placement decision, not a numerics change.  The
reference has no distributed layer (single device,
/root/reference/pixray.py:609-610); this subsystem is new capability per
SURVEY.md §2.3.
"""

from __future__ import annotations

import numpy as np


def tiny_settings(**overrides):
    """Flagship-shaped settings at dry-run scale (no side effects, no assets)."""
    from pixray_tpu.config import apply_settings

    kw = dict(
        drawer="pixel",
        prompts="a sunrise",
        clip_models="TinyTest",
        size=[64, 36],
        iterations=4,
        save_every=1000,
        init_noise=None,
        vector_prompts="none",
        num_cuts=8,
        batches=1,
        seed=7,
        outdir="",
        save_intermediates=False,
        learning_rate_drops=[],
        shard_cutouts=False,
    )
    kw.update(overrides)
    return apply_settings(kw, apply_side_effects=False)


# per-process memos: tiny perceptors (each __init__ jits a flax init) and
# unsharded baseline trajectories (each build_step is a fresh jit — without the
# memo the mesh-shape sweep recompiles the identical baseline per shape and
# blows the driver's dryrun time budget)
_tiny_perceptors: dict = {}
_baseline_memo: dict = {}


def _get_perceptor(name):
    import jax.numpy as jnp

    from pixray_tpu.models.perceptor import Perceptor

    if name not in _tiny_perceptors:
        _tiny_perceptors[name] = Perceptor(name, dtype=jnp.float32)
    return _tiny_perceptors[name]


def _build(mesh, names, num_cuts, layout="nhwc"):
    """Build (step, z0, opt_state0, refs) for the flagship-shaped tiny config.

    ``mesh=None`` builds the identical step unsharded (the parity baseline).
    ``layout`` selects the cutout-bank layout for the sequential path ('nchw'
    is the production ViT fast lane); the ensemble path is channels-last by
    design, matching engine/core.py's selection.
    """
    import jax
    import jax.numpy as jnp

    from pixray_tpu.engine.optimizers import build_optimizer
    from pixray_tpu.engine.prompts import PromptTable
    from pixray_tpu.engine.step import PerceptorSpec, StepConfig, build_step
    from pixray_tpu.parallel.ensemble import ensemble_active
    from pixray_tpu.parallel.mesh import shard_perceptor_params
    from pixray_tpu.registry import DRAWER_CLASSES, load_registries

    load_registries()
    settings = tiny_settings(num_cuts=num_cuts)
    drawer = DRAWER_CLASSES["pixel"](settings)
    drawer.snap_canvas(settings.size)
    perceptors = [_get_perceptor(n) for n in names]

    key = jax.random.PRNGKey(0)
    z = drawer.init_params(key)
    rng = np.random.default_rng(0)
    use_ensemble = ensemble_active(mesh, len(names))
    specs = [
        PerceptorSpec(
            name=p.name,
            cut_size=p.input_resolution,
            image_fn=p.image_fn,
            preprocess_fn=p.preprocess,
            variables=p.variables,
            table=PromptTable.from_rows(
                [(rng.standard_normal(p.output_dim), 1.0, float("-inf"))]
            ),
            spot_table=PromptTable.empty(p.output_dim),
            spot_off_table=PromptTable.empty(p.output_dim),
            target_table=PromptTable.empty(p.output_dim),
            layout="nhwc" if use_ensemble else layout,
        )
        for p in perceptors
    ]
    cfg = StepConfig(
        drawer=drawer,
        perceptors=specs,
        filters=[],
        custom_losses=[],
        num_cuts=settings.num_cuts,
        batches=1,
        aspect=settings.size[0] / settings.size[1],
        args=settings,
        mesh=mesh,
        ensemble=use_ensemble,
    )
    optimizer = build_optimizer("Adam", 0.03)
    opt_state = optimizer.init(z)
    step, _names = build_step(cfg, optimizer)

    refs = {
        "drawer_params": drawer.model_params,
        "perceptors": {
            p.name: (
                p.variables
                if (use_ensemble or mesh is None)
                else shard_perceptor_params(p.variables, mesh)
            )
            for p in perceptors
        },
        "image_prompts": {},
        "z_labels": None,
        "z_orig_flat": None,
        "init_image": None,
        "loss_globals": {},
        "filter_params": {},
    }
    return step, z, opt_state, refs, drawer


def _run_trajectory(mesh, names, num_cuts, n_steps, layout="nhwc"):
    """Seeded n-step trajectory: returns (losses list, final z ndarray)."""
    import jax

    from pixray_tpu.parallel.mesh import host_local, replicated

    step, z, opt_state, refs, _drawer = _build(mesh, names, num_cuts, layout)
    # place the carried state in its steady-state (replicated) sharding up
    # front: the step's outputs carry committed mesh shardings, so un-placed
    # step-0 inputs would make step 1 a full second compile of the same graph
    z = replicated(z, mesh)
    opt_state = replicated(opt_state, mesh)
    key = jax.random.PRNGKey(42)
    losses = []
    for it in range(n_steps):
        key, k = jax.random.split(key)
        z, opt_state, total, _vals, _img = step(z, opt_state, k, it, 0, 1.0, refs)
        losses.append(float(host_local(total)))
    return losses, np.asarray(host_local(z))


def run_sharded_step(mesh, num_cuts: int | None = None) -> float:
    """Compile + execute ONE full training step sharded over ``mesh``.

    Builds the real step graph (pixel-drawer synth → cutout bank [data-sharded]
    → perceptor forward/backward → optax update → latent projection) with the
    perceptor ensemble placed one-member-per-model-group when the mesh allows,
    FSDP weight sharding otherwise.  Returns the (finite) scalar loss; raises if
    the step fails to compile/execute or does not update the latent.
    """
    import jax

    from pixray_tpu.parallel.mesh import MODEL_AXIS, host_local, replicated

    model_dim = mesh.shape[MODEL_AXIS]
    n_devices = mesh.size
    # host inputs must be staged on a device THIS process can address — on a
    # multi-process mesh, mesh.devices[0,0] belongs to process 0 only
    try:
        first_device = mesh.local_mesh.devices.reshape(-1)[0]
    except Exception:
        first_device = mesh.devices.reshape(-1)[0]

    with jax.default_device(first_device):
        names = ["TinyTest"] + (["TinyTest48"] if model_dim > 1 else [])
        n_cuts = num_cuts if num_cuts is not None else 2 * n_devices
        step, z, opt_state, refs, drawer = _build(mesh, names, n_cuts)
        z = replicated(z, mesh)
        opt_state = replicated(opt_state, mesh)
        key = jax.random.PRNGKey(0)
        z2, opt_state, total, _values, _img = step(z, opt_state, key, 0, 0, 1.0, refs)
        total = float(host_local(total))
        assert np.isfinite(total), "sharded step produced non-finite loss"
        assert not np.allclose(host_local(z2), np.asarray(drawer.init_params(key))), (
            "sharded step did not update the latent"
        )
        return total


def run_parity(mesh, n_steps: int = 3, num_cuts: int | None = None,
               loss_tol: float = 2e-3, z_tol: float = 2e-3) -> dict:
    """Sharded-vs-unsharded trajectory parity on ``mesh``.

    Runs the same seeded ``n_steps`` trajectory twice — once sharded over
    ``mesh`` (ensemble placement engaged when the model axis allows; 3
    perceptors on 2 groups exercises members>groups selection) and once with
    ``mesh=None`` (plain sequential single-device graph) — and asserts
    per-step losses and the final latent agree.  Sharding only regroups
    floating-point reductions, so disagreement beyond rounding means a
    collective/placement bug (this repo's history has CPU-clean graphs
    miscompiling on other backends — the tolerance is deliberately tight).

    Returns {'shape', 'ensemble', 'loss_delta', 'z_delta'}.
    """
    import jax

    from pixray_tpu.parallel.ensemble import ensemble_active
    from pixray_tpu.parallel.mesh import MODEL_AXIS

    model_dim = mesh.shape[MODEL_AXIS]
    n_cuts = num_cuts if num_cuts is not None else 2 * mesh.size
    if model_dim > 2:
        names = ["TinyTest", "TinyTest48", "TinyTestDim48"]
    elif model_dim == 2:
        # 3 members on 2 groups: uneven placement (group 0 carries 2 members)
        names = ["TinyTest", "TinyTest48", "TinyTestDim48"]
    else:
        names = ["TinyTest"]
    layout = "nhwc" if ensemble_active(mesh, len(names)) else "nchw"

    first_device = mesh.devices.reshape(-1)[0]
    with jax.default_device(first_device):
        sharded_losses, sharded_z = _run_trajectory(mesh, names, n_cuts, n_steps, layout)
    base_key = (tuple(names), n_cuts, n_steps, layout)
    if base_key not in _baseline_memo:
        _baseline_memo[base_key] = _run_trajectory(None, names, n_cuts, n_steps, layout)
    base_losses, base_z = _baseline_memo[base_key]

    loss_delta = float(np.max(np.abs(np.asarray(sharded_losses) - np.asarray(base_losses))))
    denom = float(np.max(np.abs(base_z))) or 1.0
    z_delta = float(np.max(np.abs(sharded_z - base_z))) / denom
    assert np.all(np.isfinite(sharded_losses)), "sharded trajectory non-finite"
    assert loss_delta <= loss_tol, (
        f"sharded-vs-unsharded loss trajectories diverge: max |Δ|={loss_delta:.2e} "
        f"(tol {loss_tol}) on mesh {dict(mesh.shape)}"
    )
    assert z_delta <= z_tol, (
        f"sharded-vs-unsharded final latents diverge: rel max |Δ|={z_delta:.2e} "
        f"(tol {z_tol}) on mesh {dict(mesh.shape)}"
    )
    return {
        "shape": dict(mesh.shape),
        "ensemble": ensemble_active(mesh, len(names)),
        "members": len(names),
        "loss_delta": loss_delta,
        "z_delta": z_delta,
        "loss0": sharded_losses[0],
    }
