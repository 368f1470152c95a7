"""Multi-step block dispatch (engine/step.py::build_multi_step) parity.

A blocked run (S optimizer steps per device call via lax.scan) must follow the
IDENTICAL trajectory as the single-step loop: the in-scan PRNG schedule
(key, k = split(key) per step) replicates the host schedule of Engine.train.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import pixray_tpu as pixray
from tests.test_e2e import tiny_settings


def _run(tmp_path, sub, steps_per_call, iterations=12):
    pixray.reset_settings()
    pixray.add_settings(
        **tiny_settings(
            tmp_path / sub,
            iterations=iterations,
            save_every=100,
            display_every=100,
            steps_per_call=steps_per_call,
        )
    )
    settings = pixray.apply_settings()
    engine = pixray.do_init(settings)
    traj = []
    for it in range(iterations):
        engine.train(it)
        traj.append(float(np.asarray(engine.last_loss_values).sum()))
    return engine, traj


def test_blocked_matches_single(tmp_path):
    e1, single = _run(tmp_path, "single", steps_per_call=1)
    e2, blocked = _run(tmp_path, "blocked", steps_per_call=4)
    # blocks of 4 cover its 0..11 after the it-0 single... the block planner
    # decides; the contract is trajectory identity, not the dispatch pattern
    np.testing.assert_allclose(blocked, single, rtol=1e-5, atol=1e-6)
    # final latents agree too
    np.testing.assert_allclose(_flat_np(e1.z), _flat_np(e2.z), rtol=1e-5, atol=1e-6)


def _flat(z):
    from jax.flatten_util import ravel_pytree

    return ravel_pytree(z)[0]


def _flat_np(z):
    return np.asarray(_flat(z))


def test_block_respects_events(tmp_path):
    # save_every boundary inside the horizon: blocks must still hit every
    # iteration exactly once and keep per-iteration losses available
    e, traj = _run(tmp_path, "events", steps_per_call=0, iterations=10)
    assert len(traj) == 10
    assert np.isfinite(traj).all()


def _run_overlay(tmp_path, sub, steps_per_call, iterations=12):
    from PIL import Image

    ov = tmp_path / f"overlay_{sub}.png"
    Image.new("RGBA", (64, 36), (255, 255, 0, 200)).save(ov)
    pixray.reset_settings()
    pixray.add_settings(
        **tiny_settings(
            tmp_path / sub,
            iterations=iterations,
            save_every=100,
            display_every=100,
            steps_per_call=steps_per_call,
            overlay_image=str(ov),
            overlay_every="4i",  # overlay lands exactly on block starts (blocks of 4)
        )
    )
    settings = pixray.apply_settings()
    engine = pixray.do_init(settings)
    traj = []
    for it in range(iterations):
        engine.train(it)
        traj.append(float(np.asarray(engine.last_loss_values).sum()))
    return engine, traj


def test_blocked_overlay_on_block_start_matches_single(tmp_path):
    # Regression for the speculation bug: with overlay_every aligned to block
    # starts, block k+1 must NOT be speculatively dispatched from the
    # un-overlaid latent (the overlay is a pre-step host event at the
    # speculated block's FIRST iteration, invisible to _has_host_event).
    e1, single = _run_overlay(tmp_path, "single", steps_per_call=1)
    e2, blocked = _run_overlay(tmp_path, "blocked", steps_per_call=4)
    np.testing.assert_allclose(blocked, single, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(_flat_np(e1.z), _flat_np(e2.z), rtol=1e-5, atol=1e-6)
