"""Multi-process distributed-layer tests (SURVEY.md §2.3 multi-host row).

Spawns a REAL 2-process CPU cluster (jax.distributed.initialize with a
localhost coordinator, 2 virtual devices per process -> 4-device global
mesh) and runs the collective-gated sharded solve across it, asserting
agreement with a single-process solve.  This is the closest a single
machine gets to the >=2-host weak-scaling topology of BASELINE.md; the
test skips (not fakes) when the CPU backend lacks cross-process support,
mirroring how upstream pycllp skips OpenCL tests without a CL device.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(rank)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process cluster timed out")
        outs.append(out)
    codes = [p.returncode for p in procs]
    if any(c == 42 for c in codes):
        pytest.skip(f"cpu cross-process backend unsupported here: {outs}")
    assert codes == [0, 0], f"worker failures: {codes}\n{outs[0]}\n{outs[1]}"
    assert all("AGREE" in o for o in outs), outs
    assert all("process_count=2" in o for o in outs), outs
