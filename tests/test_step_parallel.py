"""Step-level parallelism tests: batches-as-lax.scan gradient accumulation and
data-sharding coverage of EVERY cutout path (main, spot, spot_off, image-prompt).

Reference semantics: the batches loop is pixray.py:1464-1482 (metrics read from
batch 0, gradients summed over all batches); all cutout batches feed the same
perceptor forward, so on a mesh they must all be data-sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import Mesh

from pixray_tpu.engine.optimizers import build_optimizer
from pixray_tpu.engine.prompts import PromptTable
from pixray_tpu.engine.step import PerceptorSpec, StepConfig, build_loss_fn, build_step
from pixray_tpu.models.perceptor import Perceptor
from pixray_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from pixray_tpu.registry import DRAWER_CLASSES, load_registries


def _tiny_cfg(num_cuts=8, batches=1, mesh=None, with_spot=False, with_image_prompt=False):
    from pixray_tpu.config import apply_settings

    load_registries()
    settings = apply_settings(
        dict(
            drawer="fast_pixel",
            prompts="t",
            clip_models="TinyTest",
            size=[32, 32],
            iterations=4,
            save_every=1000,
            init_noise=None,
            vector_prompts="none",
            num_cuts=num_cuts,
            batches=batches,
            seed=3,
            outdir="",
            learning_rate_drops=[],
            shard_cutouts=False,
        ),
        apply_side_effects=False,
    )
    drawer = DRAWER_CLASSES["fast_pixel"](settings)
    drawer.snap_canvas(settings.size)
    perceptor = Perceptor("TinyTest", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    table = PromptTable.from_rows(
        [(rng.standard_normal(perceptor.output_dim), 1.0, float("-inf"))]
    )
    empty = PromptTable.empty(perceptor.output_dim)
    res = perceptor.input_resolution
    spot = table if with_spot else empty
    spec = PerceptorSpec(
        name="TinyTest",
        cut_size=res,
        image_fn=perceptor.image_fn,
        variables=perceptor.variables,
        table=table,
        spot_table=spot,
        spot_off_table=spot,
        target_table=empty,
        spot_keep_on=jnp.ones((res, res)) if with_spot else None,
        spot_keep_off=jnp.ones((res, res)) if with_spot else None,
        image_prompts=(
            jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
            if with_image_prompt
            else None
        ),
    )
    cfg = StepConfig(
        drawer=drawer,
        perceptors=[spec],
        filters=[],
        custom_losses=[],
        num_cuts=num_cuts,
        batches=batches,
        aspect=1.0,
        args=settings,
        mesh=mesh,
    )
    refs = {
        "drawer_params": drawer.model_params,
        "perceptors": {"TinyTest": perceptor.variables},
        "image_prompts": (
            {"TinyTest": spec.image_prompts} if with_image_prompt else {}
        ),
        "z_labels": None,
        "z_orig_flat": None,
        "init_image": None,
        "loss_globals": {},
        "filter_params": {},
    }
    return cfg, drawer, refs


class TestBatchesScan:
    def test_scan_matches_unrolled_accumulation(self):
        """batches=3 scan accumulation == manual per-key accumulation."""
        batches = 3
        cfg, drawer, refs = _tiny_cfg(batches=batches)
        optimizer = build_optimizer("Adam", 0.05)
        key = jax.random.PRNGKey(11)
        z0 = drawer.init_params(jax.random.PRNGKey(1))
        opt_state = optimizer.init(z0)

        # reference computation first: unrolled python loop over the same keys
        # (build_step donates z/opt_state, so run it on copies afterwards)
        loss_fn = build_loss_fn(cfg)
        vg = jax.value_and_grad(loss_fn, has_aux=True)
        keys = jax.random.split(key, batches)
        (total0, (vals0, _)), grads = vg(z0, refs, keys[0], 0, 0)
        for b in range(1, batches):
            _, g = vg(z0, refs, keys[b], 0, 0)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
        updates, _ = optimizer.update(grads, optimizer.init(z0), z0)
        z_ref = cfg.drawer.clip_params(jax.tree_util.tree_map(jnp.add, z0, updates))

        step, _ = build_step(cfg, optimizer)
        z_donate = jax.tree_util.tree_map(jnp.copy, z0)
        z_scan, _, total_scan, vals_scan, _ = step(
            z_donate, opt_state, key, 0, 0, 1.0, refs
        )

        np.testing.assert_allclose(float(total_scan), float(total0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(vals_scan), np.asarray(vals0), rtol=1e-5
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            z_scan,
            z_ref,
        )

    def test_compiled_graph_size_independent_of_batches(self):
        """The scan keeps the jaxpr roughly constant as batches grows (no unroll)."""
        sizes = {}
        for batches in (2, 6):
            cfg, drawer, refs = _tiny_cfg(batches=batches)
            optimizer = build_optimizer("Adam", 0.05)
            z0 = drawer.init_params(jax.random.PRNGKey(1))
            opt_state = optimizer.init(z0)
            step, _ = build_step(cfg, optimizer)
            jaxpr = jax.make_jaxpr(
                lambda *a: step.__wrapped__(*a)
            )(z0, opt_state, jax.random.PRNGKey(0), 0, 0, 1.0, refs)
            sizes[batches] = len(str(jaxpr))
        assert sizes[6] < sizes[2] * 1.2, sizes


class TestMeshShardingCoverage:
    def test_all_cutout_paths_carry_sharding_constraints(self):
        """main + spot + spot_off + image-prompt batches all get data-sharded."""
        devices = jax.devices("cpu")
        if len(devices) < 2:
            pytest.skip("needs >=2 virtual devices")
        mesh = Mesh(
            np.asarray(devices[:2]).reshape(2, 1), (DATA_AXIS, MODEL_AXIS)
        )
        cfg, drawer, refs = _tiny_cfg(
            num_cuts=4, mesh=mesh, with_spot=True, with_image_prompt=True
        )
        loss_fn = build_loss_fn(cfg)
        z0 = drawer.init_params(jax.random.PRNGKey(1))
        jaxpr = jax.make_jaxpr(loss_fn)(z0, refs, jax.random.PRNGKey(0), 0, 0)
        n_constraints = str(jaxpr).count("sharding_constraint")
        # main, spot, spot_off, image-prompt = 4 data-sharded cutout batches
        assert n_constraints >= 4, f"only {n_constraints} sharding constraints"

    def test_sharded_step_runs_with_spot_and_image_prompts(self):
        devices = jax.devices("cpu")
        if len(devices) < 4:
            pytest.skip("needs >=4 virtual devices")
        mesh = Mesh(
            np.asarray(devices[:4]).reshape(4, 1), (DATA_AXIS, MODEL_AXIS)
        )
        cfg, drawer, refs = _tiny_cfg(
            num_cuts=8, batches=2, mesh=mesh, with_spot=True, with_image_prompt=True
        )
        optimizer = build_optimizer("Adam", 0.05)
        z0 = drawer.init_params(jax.random.PRNGKey(1))
        opt_state = optimizer.init(z0)
        step, _ = build_step(cfg, optimizer)
        leaf0 = np.asarray(jax.tree_util.tree_leaves(z0)[0]).copy()
        z, _, total, _, _ = step(z0, opt_state, jax.random.PRNGKey(0), 0, 0, 1.0, refs)
        assert np.isfinite(float(total))
        assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(z)[0]), leaf0)


def test_sharded_vs_unsharded_trajectory_parity():
    """run_parity: the same seeded trajectory sharded over a 4x2 mesh (3
    perceptors placed on 2 model groups) must match the unsharded run in
    per-step losses and final latent — sharding is placement, not numerics.
    The driver's dryrun_multichip sweeps more shapes; this pins the contract
    in CI."""
    from pixray_tpu.parallel.dryrun import run_parity

    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(devices[:8]).reshape(4, 2), (DATA_AXIS, MODEL_AXIS))
    rep = run_parity(mesh, n_steps=2)
    assert rep["ensemble"] and rep["members"] == 3
    assert rep["loss_delta"] <= 2e-3 and rep["z_delta"] <= 2e-3
