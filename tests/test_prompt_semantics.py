"""Prompt-loss semantics: weight signs, stop thresholds (gradient gating), and
the LR-drop / auto-stop control loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixray_tpu.engine.prompts import PromptTable, prompt_losses


def normed(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestPromptLoss:
    def test_zero_distance_for_identical(self):
        e = normed(np.random.default_rng(0).standard_normal((1, 8))).astype(np.float32)
        table = PromptTable.from_rows([(e, 1.0, float("-inf"))])
        loss = prompt_losses(jnp.asarray(e), table)
        assert float(loss[0]) == pytest.approx(0.0, abs=1e-5)

    def test_orthogonal_distance(self):
        # orthogonal unit vectors: chord √2 → dist = 2·asin(√2/2)² = 2·(π/4)²
        x = jnp.asarray([[1.0, 0.0]])
        e = np.asarray([[0.0, 1.0]], np.float32)
        table = PromptTable.from_rows([(e, 1.0, float("-inf"))])
        expected = 2 * (np.pi / 4) ** 2
        assert float(prompt_losses(x, table)[0]) == pytest.approx(expected, rel=1e-5)

    def test_negative_weight_flips_sign_and_gradient(self):
        rng = np.random.default_rng(0)
        e = normed(rng.standard_normal((1, 8))).astype(np.float32)
        x = jnp.asarray(normed(rng.standard_normal((2, 8))).astype(np.float32))
        t_pos = PromptTable.from_rows([(e, 1.0, float("-inf"))])
        t_neg = PromptTable.from_rows([(e, -1.0, float("-inf"))])
        l_pos = float(jnp.sum(prompt_losses(x, t_pos)))
        l_neg = float(jnp.sum(prompt_losses(x, t_neg)))
        assert l_neg == pytest.approx(-l_pos, rel=1e-5)

    def test_stop_threshold_gates_gradient_not_value(self):
        """Once dist < stop, gradient is cut but the forward value is unchanged
        (the ReplaceGrad trick, pixray.py:249-280)."""
        rng = np.random.default_rng(0)
        e = normed(rng.standard_normal((1, 8))).astype(np.float32)
        x0 = jnp.asarray(normed(rng.standard_normal((1, 8))).astype(np.float32))

        base = float(prompt_losses(x0, PromptTable.from_rows([(e, 1.0, float("-inf"))]))[0])

        # stop ABOVE the current distance → gradient gated
        t_gated = PromptTable.from_rows([(e, 1.0, base + 1.0)])
        val = float(prompt_losses(x0, t_gated)[0])
        assert val == pytest.approx(base, rel=1e-5)  # forward unchanged
        g = jax.grad(lambda x: jnp.sum(prompt_losses(x, t_gated)))(x0)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

        # stop BELOW the current distance → gradient flows
        t_open = PromptTable.from_rows([(e, 1.0, base - 1.0)])
        g2 = jax.grad(lambda x: jnp.sum(prompt_losses(x, t_open)))(x0)
        assert np.abs(np.asarray(g2)).max() > 0


class TestControlLoop:
    def test_lr_drop_at_scheduled_iteration(self, tmp_path):
        import pixray_tpu as pixray
        from tests.test_e2e import tiny_settings

        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=6, learning_rate_drops=[50]))
        settings = pixray.apply_settings()
        assert settings.learning_rate_drops == [2]  # 50% of (6-1)
        engine = pixray.do_init(settings)
        for it in range(4):
            engine.train(it)
        assert engine.tracker.num_loss_drop == 1
        assert engine.lr_scale == pytest.approx(0.1)

    def test_auto_stop_after_stale_plateau(self, tmp_path):
        import pixray_tpu as pixray
        from tests.test_e2e import tiny_settings

        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=30, auto_stop=True,
                                            learning_rate_drops=[]))
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        # force permanent staleness: pretend an unbeatable best at iteration 0
        engine.tracker.best_loss = -1e9
        engine.tracker.best_iter = 0
        engine.tracker.max_loss_drops = 0
        keep = True
        it = 0
        while keep and it < 30:
            keep = engine.train(it)
            it += 1
        assert it < 30, "auto_stop must end the run on a stale plateau"


class TestVectorPrompts:
    """The default --vector_prompts textoff must APPLY (assets shipped in
    vectors/, converted from the reference's data files; pixray.py:887-915)."""

    def _args(self, **kw):
        from types import SimpleNamespace

        base = dict(
            prompts=[], vector_prompts=["textoff"], spot_prompts=[],
            spot_prompts_off=[], labels=[], noise_prompt_seeds=None,
            noise_prompt_weights=None, animation_dir=None,
        )
        base.update(kw)
        return SimpleNamespace(**base)

    def test_textoff_asset_found(self):
        from pixray_tpu.engine.prompts import find_vector_file

        path = find_vector_file("textoff")
        assert path is not None, "vectors/textoff.json must ship with the repo"
        import json

        with open(path) as f:
            table = json.load(f)
        # the reference asset covers the CLIP + SLIP model families
        for name in ("RN50", "RN101", "RN50x4", "ViT-B/32", "ViT-B/16", "SLIP_VITB16"):
            assert name in table

    def test_textoff_row_applied_for_covered_perceptor(self):
        from types import SimpleNamespace

        from pixray_tpu.engine.prompts import build_prompt_tables

        perceptor = SimpleNamespace(name="ViT-B/32", output_dim=512)
        tables, *_ = build_prompt_tables(self._args(), [perceptor])
        table = tables["ViT-B/32"]
        assert table.size == 1  # the textoff row
        assert float(table.weights[0]) == pytest.approx(0.1)  # 0.1x scaling

    def test_uncovered_perceptor_warns_and_continues(self, capsys):
        from types import SimpleNamespace

        from pixray_tpu.engine.prompts import build_prompt_tables

        perceptor = SimpleNamespace(name="TinyTest", output_dim=64)
        tables, *_ = build_prompt_tables(self._args(), [perceptor])
        assert tables["TinyTest"].size == 0
        out = capsys.readouterr().out
        assert "no vector for TinyTest" in out
        assert "not found" not in out  # the FILE is present
