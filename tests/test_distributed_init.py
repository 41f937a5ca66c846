"""Two-process jax.distributed bootstrap smoke test (SURVEY.md section 5.8).

Exercises parallel/mesh.init_distributed — the multi-host entry the
production topology uses on a pod slice (gRPC coordinator bootstrap) — with
two local CPU processes: each worker initializes against a localhost
coordinator, asserts the global process/device view, and runs a real
cross-process collective (process_allgather). Skipped (with the reason
in the skip message) only when the sandbox forbids localhost sockets or
this jax build lacks CPU cross-process collectives.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
try:  # CPU cross-process collectives backend (name varies by jax version)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, ".")
from liquiddsp_tpu.parallel.mesh import init_distributed

coordinator, pid = sys.argv[1], int(sys.argv[2])
init_distributed(coordinator=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

import numpy as np
from jax.experimental import multihost_utils

got = multihost_utils.process_allgather(np.array([float(pid + 1)]))
assert got.shape[0] == 2 and float(got.sum()) == 3.0, got
print(f"worker {pid}: OK procs=2 devices=2 allgather={got.ravel().tolist()}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestDistributedInit:
    def test_two_process_bootstrap_and_collective(self, tmp_path):
        coordinator = f"127.0.0.1:{_free_port()}"
        script = tmp_path / "worker.py"
        script.write_text(WORKER)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one device per process
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), coordinator, str(pid)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            for pid in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=240)
                outs.append(out.decode(errors="replace"))
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip(
                "environment forbids the localhost gRPC bootstrap "
                "(coordinator handshake timed out)"
            )
        rcs = [p.returncode for p in procs]
        joined = "\n---\n".join(outs)
        if any(rc != 0 for rc in rcs):
            lowered = joined.lower()
            if any(
                key in lowered
                for key in (
                    "permission denied",
                    "connection refused",
                    "unavailable",
                    "deadline exceeded",
                    "not implemented",
                    "no cpu collectives",
                )
            ):
                pytest.skip(
                    f"environment lacks two-process jax.distributed support: "
                    f"{joined[-400:]}"
                )
            raise AssertionError(f"distributed workers failed (rc={rcs}):\n{joined}")
        assert "worker 0: OK" in joined and "worker 1: OK" in joined, joined
