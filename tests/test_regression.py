"""Trajectory regression fixture: the seeded tiny run's first loss values.

Guards the whole stack (seeding → init noise → drawer init → cutouts → perceptor
→ prompt loss → optimizer) against silent behavior drift between rounds.  Values
recorded on CPU (tests always run on the virtual CPU mesh); loose tolerance
absorbs cross-version numeric noise while still catching real semantic changes.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import pixray_tpu as pixray
from tests.test_e2e import tiny_settings

# recorded 2026-08-17 (round 3), jax 0.9.0, CPU.
# Re-recorded after commit 8f3e926 (round 2) changed seeded numerics: the color
# jitter now runs its HSV math in f32 with double-where safe denominators (the
# gray-pixel NaN fix), which legitimately moves the seeded trajectory.
EXPECTED_TRAJECTORY = [1.028834, 0.941927, 0.809862]


def test_seeded_trajectory(tmp_path):
    pixray.reset_settings()
    pixray.add_settings(**tiny_settings(tmp_path, iterations=6))
    settings = pixray.apply_settings()
    engine = pixray.do_init(settings)
    traj = []
    for it in range(3):
        engine.train(it)
        traj.append(float(np.asarray(engine.last_loss_values).sum()))
    np.testing.assert_allclose(traj, EXPECTED_TRAJECTORY, rtol=2e-2)
