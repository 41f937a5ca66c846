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


WORKER_SHARDED_RX = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, ".")
from liquiddsp_tpu.parallel.mesh import init_distributed

coordinator, pid = sys.argv[1], int(sys.argv[2])
init_distributed(coordinator=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()  # 4 per process (parent XLA_FLAGS)

import numpy as np
import jax.numpy as jnp

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.parallel.halo import sharded_framesync
from liquiddsp_tpu.parallel.mesh import channel_sharding, make_mesh
from liquiddsp_tpu.phy import framegen
from liquiddsp_tpu.utils.metrics import LinkMetrics

cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=32)
mesh = make_mesh(n_time=8, n_ch=1)  # devices 0-3 on process 0, 4-7 on process 1
T_LOCAL = 2048
T = 8 * T_LOCAL

# identical stream built independently on both controllers (same seed):
# one interior frame + a straddler on EVERY internal shard boundary —
# boundary 3->4 is the OS-process boundary, so that frame's halo ppermute
# moves samples from process 1's device 4 to process 0's device 3
rng = np.random.default_rng(0)
f = framegen.frame_length(cfg)
starts = [300] + [T_LOCAL * (i + 1) - f // 2 for i in range(7)]
n_frames = len(starts)
payloads = rng.integers(0, 256, (n_frames, 32), dtype=np.uint8)
frames = np.asarray(framegen.framegen(jnp.asarray(payloads), cfg))
stream = np.zeros((1, T), dtype=np.complex64)
for s, fr in zip(starts, frames):
    stream[0, s : s + f] = fr
# mild AWGN (~25 dB SNR) so the decode is not a trivially clean pass
p_sig = float(np.mean(np.abs(frames) ** 2))
sigma = np.sqrt(p_sig / (2 * 10 ** (25.0 / 10)))
stream += sigma * (
    rng.standard_normal(stream.shape) + 1j * rng.standard_normal(stream.shape)
).astype(np.complex64)

x = jax.make_array_from_callback(
    (1, T), channel_sharding(mesh), lambda idx: stream[idx]
)

exp_starts = jnp.asarray(np.asarray(starts), dtype=jnp.int32)
table = jnp.asarray(payloads)


@jax.jit
def rx(x):
    # the production decode program: shard_map + ppermute halo + ownership
    # masking (parallel/halo.py), followed by LinkMetrics reductions over the
    # time-sharded result (XLA inserts the cross-process all-reduces)
    res = sharded_framesync(x, cfg, mesh, max_frames_per_shard=4)
    metrics = LinkMetrics.from_results(res, T)
    d = jnp.abs(res.start[..., None] - exp_starts[None, None, :])
    idx = jnp.argmin(d, axis=-1)
    near = jnp.min(d, axis=-1) <= 1
    bitexact = jnp.all(res.payload == table[idx], axis=-1)
    ok = res.payload_valid & near & bitexact
    found = jnp.zeros((n_frames,), bool).at[idx].max(ok)
    return (
        metrics,
        jnp.sum(res.mask.astype(jnp.int32)),
        jnp.sum(ok.astype(jnp.int32)),
        jnp.sum(found.astype(jnp.int32)),
    )


metrics, n_mask, n_ok, n_found = rx(x)
assert int(n_mask) == n_frames, (int(n_mask), n_frames)
assert int(n_ok) == n_frames, (int(n_ok), n_frames)
assert int(n_found) == n_frames, (int(n_found), n_frames)
assert int(metrics.frames_detected) == n_frames
assert int(metrics.payloads_valid) == n_frames
print(
    f"worker {pid}: SHARDED-RX-OK procs=2 frames={int(n_found)}/{n_frames} "
    f"bitexact={int(n_ok)} straddles=7 process_boundary_straddles=1 "
    f"metrics_payloads_valid={int(metrics.payloads_valid)}"
)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_workers(script_text, tmp_path, xla_flags=None, timeout=240):
    """Spawn two coordinator-bootstrapped workers; returns their joined
    output, or pytest.skip()s when the sandbox forbids the setup."""
    coordinator = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    if xla_flags:
        env["XLA_FLAGS"] = xla_flags
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
            out, _ = p.communicate(timeout=timeout)
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
    return joined


class TestDistributedInit:
    def test_two_process_bootstrap_and_collective(self, tmp_path):
        joined = _run_two_workers(WORKER, tmp_path)
        assert "worker 0: OK" in joined and "worker 1: OK" in joined, joined

    def test_two_process_sharded_rx_decode(self, tmp_path):
        """The PRODUCTION sharded RX program — shard_map + ppermute halo +
        ownership masking + LinkMetrics reductions — executed across two OS
        processes (2 procs x 4 CPU devices, gloo collectives), with a frame
        straddling every internal time-shard boundary including the
        process-boundary edge (shard 3 on proc 0 <- halo from shard 4 on
        proc 1), all payloads asserted bit-exact inside the program.

        This is the multi-host leg of BASELINE config 5 (SURVEY.md section
        5.8) that single-process dryruns cannot prove."""
        joined = _run_two_workers(
            WORKER_SHARDED_RX,
            tmp_path,
            xla_flags="--xla_force_host_platform_device_count=4",
            timeout=420,
        )
        assert "worker 0: SHARDED-RX-OK" in joined, joined
        assert "worker 1: SHARDED-RX-OK" in joined, joined
        assert joined.count("frames=8/8") == 2, joined
