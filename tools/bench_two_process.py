#!/usr/bin/env python
"""Cross-process sharding overhead: 1 process vs 2 processes, same work.

Completes the weak-scaling story (bench/WEAK_SCALING.json): the cpu_mesh
curve is confounded by host-core oversubscription and the controlled
``fixed_total_overhead`` block shows in-process sharding+halo overhead ~ 0.
This script measures the remaining structural question — what does
crossing an OS-process boundary cost? — by running the IDENTICAL
fixed-total sharded decode (time=8 mesh, one ppermute halo per block,
parallel/halo.sharded_framesync) twice on the same host:

  A) one process exposing 8 virtual CPU devices;
  B) two gloo-bootstrapped processes x 4 devices each (the halo between
     shards 3 and 4 crosses the process boundary every iteration).

Both runs share cores, work, and program; the throughput ratio B/A is the
cross-process collective overhead. Merged into bench/WEAK_SCALING.json
under "two_process".

Usage: python tools/bench_two_process.py --out bench/WEAK_SCALING.json
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

WORKER = r"""
import json, sys, time
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, ".")

coordinator, pid, nprocs, iters, out = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
)
if coordinator != "-":
    from liquiddsp_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator=coordinator, num_processes=nprocs, process_id=pid)

import numpy as np
import jax.numpy as jnp

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.parallel.halo import sharded_framesync
from liquiddsp_tpu.parallel.mesh import channel_sharding, make_mesh
from liquiddsp_tpu.phy import framegen

assert len(jax.devices()) == 8, jax.devices()
cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=32)
mesh = make_mesh(n_time=8, n_ch=1)
T_LOCAL = 2048
T = 8 * T_LOCAL

rng = np.random.default_rng(0)
f = framegen.frame_length(cfg)
starts = [300] + [T_LOCAL * (i + 1) - f // 2 for i in range(7)]
payloads = rng.integers(0, 256, (len(starts), 32), dtype=np.uint8)
frames = np.asarray(framegen.framegen(jnp.asarray(payloads), cfg))
stream = np.zeros((1, T), dtype=np.complex64)
for s, fr in zip(starts, frames):
    stream[0, s : s + f] = fr

x = jax.make_array_from_callback((1, T), channel_sharding(mesh), lambda i: stream[i])


@jax.jit
def rx(x):
    res = sharded_framesync(x, cfg, mesh, max_frames_per_shard=4)
    return jnp.sum(res.payload_valid.astype(jnp.int32))


n = int(rx(x))  # compile + correctness
assert n == len(starts), (n, len(starts))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        v = rx(x)
        acc = v if acc is None else acc + v
    assert int(acc) == iters * len(starts)
    best = min(best, time.perf_counter() - t0)
rate = T * iters / best
if pid == 0:
    json.dump({"samples_per_sec": rate, "iters": iters, "total_samples": T},
              open(out, "w"))
print(f"worker {pid}: {rate/1e6:.3f} Msamp/s")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "worker.py")
        with open(script, "w") as fh:
            fh.write(WORKER)

        def run(nprocs: int) -> dict:
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={8 // nprocs}"
            )
            out = os.path.join(td, f"rate{nprocs}.json")
            coordinator = "-" if nprocs == 1 else f"127.0.0.1:{_free_port()}"
            procs = [
                subprocess.Popen(
                    [sys.executable, script, coordinator, str(pid), str(nprocs),
                     str(args.iters), out],
                    env=env, cwd=repo,
                )
                for pid in range(nprocs)
            ]
            for p in procs:
                assert p.wait(timeout=600) == 0, f"worker failed (nprocs={nprocs})"
            return json.load(open(out))

        a = run(1)
        b = run(2)
    ratio = b["samples_per_sec"] / a["samples_per_sec"]
    block = {
        "mode": "fixed_total_two_process",
        "host_cores": os.cpu_count(),
        "note": (
            "same fixed-total time=8 sharded decode on the same 2-core host: "
            "one process x 8 devices vs two gloo processes x 4 devices (halo "
            "3->4 crosses the OS-process boundary every iteration); the "
            "ratio isolates cross-process collective overhead"
        ),
        "one_process_samples_per_sec": a["samples_per_sec"],
        "two_process_samples_per_sec": b["samples_per_sec"],
        "two_process_efficiency": ratio,
    }
    print(json.dumps(block))
    if args.out:
        art = json.load(open(args.out)) if os.path.exists(args.out) else {}
        art["two_process"] = block
        with open(args.out, "w") as fh:
            json.dump(art, fh, indent=1)


if __name__ == "__main__":
    main()
