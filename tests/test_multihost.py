"""Multi-host (DCN) mesh: 2 OS processes × 2 virtual CPU devices each.

SURVEY.md §2.3 names ICI+DCN as the distributed design target; the reference
has no distributed layer at all (single device, /root/reference/pixray.py:609).
This test proves the real flagship step graph compiles AND executes over a
mesh whose data axis crosses an OS-process boundary (the DCN analog): two
subprocess workers join a jax.distributed cluster (gloo CPU collectives),
build the canonical 'hosts' mesh via ``build_mesh``, and each runs one full
sharded training step — the latent-gradient psum rides the cross-process axis.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2 subprocesses × full-step CPU compile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_step(tmp_path):
    port = _free_port()
    procs, logs = [], []
    for pid in range(2):
        env = os.environ.copy()
        env.update(
            PIXRAY_TPU_COORDINATOR=f"127.0.0.1:{port}",
            PIXRAY_TPU_NUM_PROCESSES="2",
            PIXRAY_TPU_PROCESS_ID=str(pid),
            PIXRAY_TPU_NO_DOWNLOAD="1",
        )
        # a parent-initialized JAX must not leak its backend choice or the
        # conftest's 8-device count (the worker wants 2 local devices)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        log = tmp_path / f"worker{pid}.log"
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                cwd=REPO,
                stdout=open(log, "w"),
                stderr=subprocess.STDOUT,
            )
        )
    try:
        rcs = [p.wait(timeout=900) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [log.read_text() for log in logs]
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"worker {pid} failed (rc={rc}):\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid} hosts=2 local=2" in out, out[-4000:]
    # the replicated loss must agree bit-for-bit across hosts
    losses = {out.rsplit("loss=", 1)[1].split()[0].strip() for out in outs}
    assert len(losses) == 1, f"hosts disagree on the replicated loss: {losses}"
