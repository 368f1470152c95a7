"""One full sharded training step on an arbitrary mesh, for dry runs.

Shared by the driver's ``dryrun_multichip`` entry (virtual single-process CPU
mesh) and the multi-host test harness (two OS processes joined over
``jax.distributed`` with a DCN data axis) — both validate that the flagship
step's tp(weights)/dp(cutouts)/ensemble sharding surface compiles and executes
on the given mesh.  The reference has no distributed layer (single device,
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


def run_sharded_step(mesh, num_cuts: int | None = None) -> float:
    """Compile + execute ONE full training step sharded over ``mesh``.

    Builds the real step graph (pixel-drawer synth → cutout bank [data-sharded]
    → perceptor forward/backward → optax update → latent projection) with the
    perceptor ensemble placed one-member-per-model-group when the mesh allows,
    FSDP weight sharding otherwise.  Returns the (finite) scalar loss; raises if
    the step fails to compile/execute or does not update the latent.
    """
    import jax
    import jax.numpy as jnp

    from pixray_tpu.engine.optimizers import build_optimizer
    from pixray_tpu.engine.prompts import PromptTable
    from pixray_tpu.engine.step import PerceptorSpec, StepConfig, build_step
    from pixray_tpu.models.perceptor import Perceptor
    from pixray_tpu.parallel.ensemble import ensemble_active
    from pixray_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_perceptor_params
    from pixray_tpu.registry import DRAWER_CLASSES, load_registries

    load_registries()
    model_dim = mesh.shape[MODEL_AXIS]
    n_devices = mesh.size
    # host inputs must be staged on a device THIS process can address — on a
    # multi-process mesh, mesh.devices[0,0] belongs to process 0 only
    try:
        first_device = mesh.local_mesh.devices.reshape(-1)[0]
    except Exception:
        first_device = mesh.devices.reshape(-1)[0]

    with jax.default_device(first_device):
        settings = tiny_settings(
            num_cuts=num_cuts if num_cuts is not None else 2 * n_devices
        )
        drawer = DRAWER_CLASSES["pixel"](settings)
        drawer.snap_canvas(settings.size)
        names = ["TinyTest"] + (["TinyTest48"] if model_dim > 1 else [])
        perceptors = [Perceptor(n, dtype=jnp.float32) for n in names]

        key = jax.random.PRNGKey(0)
        z = drawer.init_params(key)
        rng = np.random.default_rng(0)
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
            )
            for p in perceptors
        ]
        use_ensemble = ensemble_active(mesh, len(specs))
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
                    if use_ensemble
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
        z2, opt_state, total, values, img = step(z, opt_state, key, 0, 0, 1.0, refs)
        from pixray_tpu.parallel.mesh import host_local

        total = float(host_local(total))
        assert np.isfinite(total), "sharded step produced non-finite loss"
        assert not np.allclose(host_local(z2), np.asarray(drawer.init_params(key))), (
            "sharded step did not update the latent"
        )
        return total
