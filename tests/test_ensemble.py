"""Perceptor-ensemble model-axis placement tests (parallel/ensemble.py).

The reference runs its perceptor ensemble sequentially on one GPU
(/root/reference/pixray.py:1278-1336); here members are placed one-per-model-group
on the mesh.  These tests verify on a virtual CPU mesh that the placed path is
numerically IDENTICAL (value and gradient) to the sequential path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pixray_tpu.engine.prompts import PromptTable, prompt_losses
from pixray_tpu.models.perceptor import Perceptor
from pixray_tpu.parallel.ensemble import (
    EnsembleMember,
    ensemble_active,
    ensemble_scores,
)
from pixray_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _mesh(data, model):
    devices = jax.devices("cpu")
    if len(devices) < data * model:
        pytest.skip(f"needs {data * model} virtual devices")
    return Mesh(
        np.asarray(devices[: data * model]).reshape(data, model),
        (DATA_AXIS, MODEL_AXIS),
    )


def _img_fn(p):
    """Per-sample-independent encode (the ensemble contract): the batch-coupled
    adjust_range preprocessing is applied to whole batches by the caller."""

    def fn(variables, b):
        return p.image_fn(variables, b, apply_preprocess=False)

    return fn


def _members(names):
    percs = [Perceptor(n, dtype=jnp.float32) for n in names]
    members = [EnsembleMember(p.name, _img_fn(p), p.output_dim) for p in percs]
    return percs, members


def _batches(rng, percs, n):
    return [
        percs[i].preprocess(
            jnp.asarray(
                rng.uniform(size=(n, p.input_resolution, p.input_resolution, 3)),
                jnp.float32,
            )
        )
        for i, p in enumerate(percs)
    ]


def _tables(rng, percs, sizes):
    out = []
    for p, k in zip(percs, sizes):
        if k == 0:
            out.append(PromptTable.empty(p.output_dim))
        else:
            out.append(
                PromptTable.from_rows(
                    [
                        (rng.standard_normal(p.output_dim), 1.0 if i % 2 == 0 else -0.5,
                         float("-inf"))
                        for i in range(k)
                    ]
                )
            )
    return out


def _toy_members(rng, specs):
    """Synthetic heterogeneous members: small nonlinear towers instead of CLIP.

    The fast-tier canary targets the switch_placed custom_vjp TRANSPOSE — the
    ensemble placement machinery is identical whatever image_fn computes, and a
    tiny dense tower compiles in seconds where two CLIP towers cost ~90 s of
    XLA CPU compile on the 1-core CI box.  Full CLIP-tower placement parity
    stays covered in the slow tier (test_matches_sequential_clip_towers,
    test_loss_fn_ensemble_matches_sequential_path)."""
    members, variables, resolutions = [], [], []
    for name, res, dim in specs:
        w = jnp.asarray(rng.standard_normal((res * res * 3, dim)) / res, jnp.float32)

        def fn(v, b):
            return jnp.tanh(b.reshape(b.shape[0], -1).astype(jnp.float32) @ v["w"])

        members.append(EnsembleMember(name, fn, dim))
        variables.append({"w": w})
        resolutions.append(res)
    return members, variables, resolutions


def _toy_batches(rng, resolutions, n):
    return [
        jnp.asarray(rng.uniform(size=(n, r, r, 3)), jnp.float32) for r in resolutions
    ]


def _toy_tables(rng, dims, sizes):
    out = []
    for d, k in zip(dims, sizes):
        if k == 0:
            out.append(PromptTable.empty(d))
        else:
            out.append(
                PromptTable.from_rows(
                    [
                        (rng.standard_normal(d), 1.0 if i % 2 == 0 else -0.5,
                         float("-inf"))
                        for i in range(k)
                    ]
                )
            )
    return out


class TestEnsembleScores:
    def test_matches_sequential_value_and_grad(self):
        """2 heterogeneous members on a (2,2) mesh == sequential per-member scoring.

        This is the every-push canary for the switch_placed custom_vjp transpose
        (VERDICT r2 #7) — it must stay in the FAST tier, so members are tiny
        synthetic towers (see _toy_members); the placement/transpose machinery
        under test is exactly the one the CLIP towers use."""
        from pixray_tpu.engine.prompts import single_prompt_loss

        mesh = _mesh(2, 2)
        rng = np.random.default_rng(0)
        members, variables, resolutions = _toy_members(
            rng, [("ToyA", 8, 16), ("ToyB", 12, 24)]
        )
        n = 8
        batches = _toy_batches(rng, resolutions, n)
        pair_batches = _toy_batches(rng, resolutions, n)  # image-prompt cutouts
        tables = _toy_tables(rng, [16, 24], [2, 3])
        pair_w = [0.8, -0.6]  # member 1 exercises the negative-weight sign path

        def placed(batches, pair_batches):
            vals, _ = ensemble_scores(
                mesh, members, {"main": list(batches)}, {"main": tables}, variables,
                pair_jobs={"imgp0": (list(pair_batches), pair_w)},
            )
            return (
                jnp.sum(vals["main"][0, :2]) + jnp.sum(vals["main"][1, :3])
                + jnp.sum(vals["imgp0"][:, 0])
            )

        def sequential(batches, pair_batches):
            tot = 0.0
            for m, v, b, pb, t, w in zip(
                members, variables, batches, pair_batches, tables, pair_w
            ):
                iii = m.image_fn(v, b)
                emb = m.image_fn(v, pb)
                tot = tot + jnp.sum(prompt_losses(iii, t))
                tot = tot + single_prompt_loss(iii, emb, w)
            return tot

        v_p, g_p = jax.value_and_grad(placed, argnums=(0, 1))(
            tuple(batches), tuple(pair_batches)
        )
        v_s, g_s = jax.value_and_grad(sequential, argnums=(0, 1))(
            tuple(batches), tuple(pair_batches)
        )
        np.testing.assert_allclose(float(v_p), float(v_s), rtol=2e-5)
        for ga, gb in zip(g_p, g_s):
            for a, b in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6)

    @pytest.mark.slow
    def test_matches_sequential_clip_towers(self):
        """The same value+grad parity with REAL (tiny) CLIP towers — the
        end-to-end evidence that heterogeneous perceptor members place
        correctly; slow tier (~100 s of XLA CPU compile on the CI box)."""
        from pixray_tpu.engine.prompts import single_prompt_loss

        mesh = _mesh(2, 2)
        percs, members = _members(["TinyTest", "TinyTest48"])
        rng = np.random.default_rng(0)
        n = 8
        batches = _batches(rng, percs, n)
        pair_batches = _batches(rng, percs, n)
        tables = _tables(rng, percs, [2, 3])
        variables = [p.variables for p in percs]
        pair_w = [0.8, -0.6]

        def placed(batches, pair_batches):
            vals, _ = ensemble_scores(
                mesh, members, {"main": list(batches)}, {"main": tables}, variables,
                pair_jobs={"imgp0": (list(pair_batches), pair_w)},
            )
            return (
                jnp.sum(vals["main"][0, :2]) + jnp.sum(vals["main"][1, :3])
                + jnp.sum(vals["imgp0"][:, 0])
            )

        def sequential(batches, pair_batches):
            tot = 0.0
            for p, b, pb, t, w in zip(percs, batches, pair_batches, tables, pair_w):
                iii = p.image_fn(p.variables, b, apply_preprocess=False)
                emb = p.image_fn(p.variables, pb, apply_preprocess=False)
                tot = tot + jnp.sum(prompt_losses(iii, t))
                tot = tot + single_prompt_loss(iii, emb, w)
            return tot

        v_p, g_p = jax.value_and_grad(placed, argnums=(0, 1))(
            tuple(batches), tuple(pair_batches)
        )
        v_s, g_s = jax.value_and_grad(sequential, argnums=(0, 1))(
            tuple(batches), tuple(pair_batches)
        )
        np.testing.assert_allclose(float(v_p), float(v_s), rtol=2e-5)
        for ga, gb in zip(g_p, g_s):
            for a, b in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6)

    @pytest.mark.slow
    def test_padded_rows_are_inert(self):
        """Members with different table sizes and embed dims: padded entries are 0.

        slow tier: a distinct member/table geometry = a second ~15 s shard_map
        compile; the fast-tier canary above already exercises the placed path."""
        mesh = _mesh(2, 2)
        percs, members = _members(["TinyTest", "TinyTestDim48"])  # dims 32 vs 48
        rng = np.random.default_rng(1)
        n = 4
        batches = _batches(rng, percs, n)
        tables = _tables(rng, percs, [1, 3])
        vals, iii = ensemble_scores(
            mesh, members, {"main": batches}, {"main": tables},
            [p.variables for p in percs], want_iii_of=1,
        )
        v = np.asarray(vals["main"])
        assert v.shape == (2, 3)
        np.testing.assert_allclose(v[0, 1:], 0.0, atol=1e-7)  # padded rows
        # per-member values match sequential scoring
        for i, (p, b, t) in enumerate(zip(percs, batches, tables)):
            ref = np.asarray(prompt_losses(p.image_fn(p.variables, b, apply_preprocess=False), t))
            np.testing.assert_allclose(v[i, : t.size], ref, rtol=2e-5)
        # iii returns member 1's full-dim embeddings, assembled across the data axis
        ref_iii = np.asarray(percs[1].image_fn(percs[1].variables, batches[1], apply_preprocess=False))
        assert iii.shape == (n, 48)
        np.testing.assert_allclose(np.asarray(iii), ref_iii, rtol=2e-5, atol=1e-6)

    @pytest.mark.slow
    def test_three_members_two_groups_round_robin(self):
        """P=3 members on M=2 groups: the second round places member 2 correctly.

        slow tier: see test_padded_rows_are_inert."""
        mesh = _mesh(2, 2)
        percs, members = _members(["TinyTest", "TinyTest48", "TinyTestDim48"])
        rng = np.random.default_rng(2)
        n = 4
        batches = _batches(rng, percs, n)
        tables = _tables(rng, percs, [1, 1, 2])
        vals, _ = ensemble_scores(
            mesh, members, {"main": batches}, {"main": tables},
            [p.variables for p in percs],
        )
        v = np.asarray(vals["main"])
        for i, (p, b, t) in enumerate(zip(percs, batches, tables)):
            ref = np.asarray(prompt_losses(p.image_fn(p.variables, b, apply_preprocess=False), t))
            np.testing.assert_allclose(v[i, : t.size], ref, rtol=2e-5)


class TestEnsembleActive:
    def test_predicate(self):
        mesh22 = _mesh(2, 2)
        mesh41 = _mesh(4, 1)
        assert ensemble_active(mesh22, 2)
        assert not ensemble_active(mesh41, 2)  # no model axis
        assert not ensemble_active(mesh22, 1)  # single perceptor
        assert not ensemble_active(None, 3)


class TestEnsembleStepPath:
    @pytest.mark.slow
    def test_loss_fn_ensemble_matches_sequential_path(self):
        # slow tier: compiles the FULL step loss twice (placed + auto-sharded)
        # on a mesh — ~5 min of XLA CPU compile on the 1-core box; the fast-tier
        # canary for the placed path is TestEnsembleScores above
        """build_loss_fn with ensemble placement == the auto-sharded loop,
        including spot/spot_off tables, value AND dz gradient."""
        from pixray_tpu.config import apply_settings
        from pixray_tpu.engine.step import PerceptorSpec, StepConfig, build_loss_fn
        from pixray_tpu.registry import DRAWER_CLASSES, load_registries

        mesh = _mesh(2, 2)
        load_registries()
        settings = apply_settings(
            dict(
                drawer="fast_pixel", prompts="t", clip_models="TinyTest",
                size=[32, 32], iterations=2, save_every=1000, init_noise=None,
                vector_prompts="none", num_cuts=4, batches=1, seed=5, outdir="",
                learning_rate_drops=[],
            ),
            apply_side_effects=False,
        )
        drawer = DRAWER_CLASSES["fast_pixel"](settings)
        drawer.snap_canvas(settings.size)

        percs = [Perceptor(n, dtype=jnp.float32) for n in ["TinyTest", "TinyTest48"]]
        rng = np.random.default_rng(3)
        # one canvas-sized prompt image per perceptor: the image-prompt term now
        # runs INSIDE the placed program (pair jobs) and must match sequential
        imgp = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        specs = []
        for p in percs:
            res = p.input_resolution
            specs.append(
                PerceptorSpec(
                    name=p.name,
                    cut_size=res,
                    image_fn=p.image_fn,
                    preprocess_fn=p.preprocess,
                    variables=p.variables,
                    table=PromptTable.from_rows(
                        [(rng.standard_normal(p.output_dim), 1.0, float("-inf"))]
                    ),
                    spot_table=PromptTable.from_rows(
                        [(rng.standard_normal(p.output_dim), 0.7, float("-inf"))]
                    ),
                    spot_off_table=PromptTable.empty(p.output_dim),
                    target_table=PromptTable.empty(p.output_dim),
                    spot_keep_on=jnp.ones((res, res)),
                    spot_keep_off=None,
                    image_prompts=imgp,
                    image_prompt_weight=0.5,
                )
            )

        refs = {
            "drawer_params": drawer.model_params,
            "perceptors": {p.name: p.variables for p in percs},
            "image_prompts": {p.name: imgp for p in percs},
            "z_labels": None,
            "z_orig_flat": None,
            "init_image": None,
            "loss_globals": {},
            "filter_params": {},
        }

        def build(ensemble):
            cfg = StepConfig(
                drawer=drawer, perceptors=specs, filters=[], custom_losses=[],
                num_cuts=4, batches=1, aspect=1.0, args=settings, mesh=mesh,
                ensemble=ensemble,
            )
            names = []
            return build_loss_fn(cfg, names), names

        z0 = drawer.init_params(jax.random.PRNGKey(1))
        key = jax.random.PRNGKey(7)

        loss_e, names_e = build(True)
        loss_s, names_s = build(False)
        (v_e, (vals_e, _)), g_e = jax.value_and_grad(loss_e, has_aux=True)(
            z0, refs, key, 0, 0
        )
        (v_s, (vals_s, _)), g_s = jax.value_and_grad(loss_s, has_aux=True)(
            z0, refs, key, 0, 0
        )
        assert names_e == names_s
        np.testing.assert_allclose(float(v_e), float(v_s), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(vals_e), np.asarray(vals_s), rtol=2e-5,
                                   atol=1e-7)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
            ),
            g_e, g_s,
        )
