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

# recorded 2026-08-19 (round 4), jax 0.9.0, CPU.
# Re-recorded after the channel-major cutout pipeline (engine/cutouts.py
# layout='nchw'): the additive augmentation noise field is now drawn in the
# bank's native (N, 3, S, S) shape, which legitimately re-associates the seeded
# noise values with (pixel, channel) positions (statistically identical).
# (recorded under conftest's environment — the 8-device virtual CPU mesh;
# single-device runs drift a few % through reduction order + jitter gray-ties)
EXPECTED_TRAJECTORY = [0.954001, 0.931523, 0.830106]


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
