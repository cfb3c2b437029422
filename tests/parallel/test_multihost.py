"""Launch a real 2-process CPU multi-host run (jax.distributed over TCP).

Covers shard_batch's process-local branch, allreduce_mean's
process_allgather branch and rank-0 gating — paths the reference only ever
exercised via mpirun on real clusters (SURVEY.md §4: no distributed tests).
"""
import os
import socket
import subprocess
import sys

import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


_RUNNER = os.path.join(os.path.dirname(__file__), "..", "multihost_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_multihost():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # runner sets its own device count

    procs = [
        subprocess.Popen(
            [sys.executable, _RUNNER, str(rank), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outputs = []
    for rank, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.fail(f"rank {rank} timed out")
        outputs.append(out)

    for rank, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK rank={rank}" in out
