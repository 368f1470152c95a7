"""bench.py publication-gate contracts (pure host logic, no device).

A regression in a benched config must make bench.py exit nonzero instead of
publishing a number (VERDICT r4: per-config descent + clipdraw precision
ladder + mesh smoke).  These pin the gate functions' refusal behavior.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import CONFIG_CHECKS, CONFIGS, check_descent, check_precision_gate


def test_all_benched_configs_have_a_check_policy():
    assert set(CONFIG_CHECKS) == set(CONFIGS)


def test_descent_passes_on_falling_loss():
    losses = list(np.linspace(1.0, 0.5, 30))
    check_descent("pixel", losses, "descent")  # no raise


def test_descent_refuses_flat_loss():
    with pytest.raises(SystemExit):
        check_descent("fft", [0.9] * 30, "descent")


def test_descent_refuses_nan_even_in_finite_mode():
    with pytest.raises(SystemExit):
        check_descent("vdiff", [0.9, float("nan"), 0.8], "finite")


def test_finite_mode_allows_non_monotone():
    check_descent("vdiff", [0.9, 1.1, 0.8, 1.0, 0.7] * 6, "finite")  # no raise


def test_precision_gate_passes_within_band():
    losses = list(np.linspace(1.0, 0.50, 25))
    ref = {"last5": 0.50}
    out = check_precision_gate("clipdraw", losses, ref, 25, band=0.08)
    assert out.startswith("ok")


def test_precision_gate_refuses_out_of_band():
    losses = list(np.linspace(1.0, 0.70, 25))  # converges 0.2 worse
    ref = {"last5": 0.50}
    with pytest.raises(SystemExit):
        check_precision_gate("clipdraw", losses, ref, 25, band=0.08)


def test_device_probe_ok_on_reachable_backend(monkeypatch):
    """Happy path: a backend that answers promptly passes the probe.  The
    subprocess must not inherit the accelerator-plugin trigger — with the
    relay wedged it would dial it and burn the whole timeout (BUGS.md)."""
    from bench import probe_device

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    probe_device(timeout_s=120)  # raises SystemExit on failure


def test_device_probe_refuses_on_timeout(monkeypatch):
    """A relay that never answers must turn into a nonzero exit, not a hang."""
    import subprocess as sp

    import bench

    def fake_run(*a, **k):
        raise sp.TimeoutExpired(cmd="probe", timeout=k.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    with pytest.raises(SystemExit):
        bench.probe_device(timeout_s=1)


def test_device_probe_refuses_on_crash(monkeypatch):
    import bench

    class R:
        returncode = 3
        stdout = ""
        stderr = "boom"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    with pytest.raises(SystemExit):
        bench.probe_device(timeout_s=1)
