"""Process-level fault tolerance (SURVEY.md section 5.3 stretch item).

Three failure modes through the real Supervisor + subprocess workers:
crash (SIGKILL-style os._exit mid-stream), hang (heartbeat stops), and
permanent failure (restart budget exhausted). The crash worker checkpoints
StreamingRx state (save/load_stream_state) and must resume with exact
decoded-frame accounting — a frame decoded before the crash is not
recounted, one spanning the crash point is not lost.
"""

import json
import os
import subprocess
import sys
import time

from liquiddsp_tpu.runtime.supervisor import Supervisor, WorkerSpec

# Worker: decodes a deterministic multi-chunk stream with StreamingRx,
# checkpointing (stream carry + decoded-frame tally) after every chunk.
# --die-after N: os._exit(9) after N chunks unless the checkpoint shows the
# stream already progressed past that point (i.e. dies exactly once).
STREAM_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp
from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.phy import framegen
from liquiddsp_tpu.runtime.stream import StreamingRx
from liquiddsp_tpu.runtime.supervisor import Heartbeat, load_stream_state, save_stream_state

work_dir, die_after = sys.argv[1], int(sys.argv[2])
hb = Heartbeat(os.path.join(work_dir, "hb"))
ckpt = os.path.join(work_dir, "state.npz")
tally_path = os.path.join(work_dir, "tally.json")

cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
chunk, n_chunks = 2048, 6
rng = np.random.default_rng(0)
payloads = rng.integers(0, 256, (n_chunks, 64), dtype=np.uint8)
frames = np.asarray(framegen.framegen(jnp.asarray(payloads), cfg))
f = frames.shape[1]
stream = np.zeros((1, n_chunks * chunk), dtype=np.complex64)
# one frame per chunk, straddling each internal boundary (worst case for a
# crash: the straddler's head is only in the carry checkpoint)
starts = [300] + [chunk * (i + 1) - f // 2 for i in range(n_chunks - 1)]
for s, fr in zip(starts, frames):
    stream[0, s : s + f] = fr

rx = StreamingRx(cfg, batch=1, chunk_len=chunk)
extra = load_stream_state(ckpt, rx)
# the ONE crash-consistent state is the npz: stream carry + position + the
# decoded-start tally together, atomically (save_stream_state **extra) — a
# two-file protocol could lose a boundary straddler or double-count a
# chunk when a crash lands between the writes
decoded = [int(s) for s in extra["decoded"]] if extra else []

while (i := rx._samples_consumed // chunk) < n_chunks:
    hb.beat()
    res = rx.step(jnp.asarray(stream[:, i * chunk : (i + 1) * chunk]))
    m = np.asarray(res.mask)[0]
    for k in np.nonzero(m)[0]:
        assert bool(np.asarray(res.payload_valid)[0, k])
        decoded.append(rx.start_epoch + int(np.asarray(res.start)[0, k]))
    save_stream_state(ckpt, rx, decoded=np.asarray(decoded, dtype=np.int64))
    if die_after >= 0 and i + 1 == die_after and not os.path.exists(
        os.path.join(work_dir, "died")
    ):
        open(os.path.join(work_dir, "died"), "w").write("1")
        os._exit(9)

tally = {"decoded": decoded, "chunks_done": rx._samples_consumed // chunk}
json.dump(tally, open(tally_path, "w"))
print("worker done:", tally)
"""

# Worker that beats twice then wedges forever (simulated uninterruptible
# hang); after a restart (marker file exists) it finishes cleanly.
HANG_WORKER = r"""
import os, sys, time
sys.path.insert(0, ".")
from liquiddsp_tpu.runtime.supervisor import Heartbeat

work_dir = sys.argv[1]
hb = Heartbeat(os.path.join(work_dir, "hb"))
marker = os.path.join(work_dir, "hung_once")
if not os.path.exists(marker):
    open(marker, "w").write("1")
    hb.beat()
    time.sleep(3600)  # wedge: no further beats
hb.beat()
print("worker recovered")
"""

FAIL_WORKER = "import os; os._exit(7)\n"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    return env


class TestSupervisor:
    def test_crash_restart_resumes_stream_exactly_once(self, tmp_path):
        wd = str(tmp_path)
        script = tmp_path / "worker.py"
        script.write_text(STREAM_WORKER)
        events = []
        sup = Supervisor(
            [
                WorkerSpec(
                    name="rx0",
                    argv=[sys.executable, str(script), wd, "3"],  # die after chunk 3
                    heartbeat_path=os.path.join(wd, "hb"),
                    stale_after_s=120.0,  # CPU jit compile outlasts short timers
                    max_restarts=2,
                )
            ],
            on_event=lambda n, ev, d: events.append((ev, d)),
            env=_env(),
        )
        sup.start()
        summary = sup.run(poll_interval_s=0.25, timeout_s=600)[0]
        assert summary["restarts"] == 1 and not summary["gave_up"], (summary, events)
        assert summary["returncode"] == 0
        tally = json.load(open(os.path.join(wd, "tally.json")))
        assert tally["chunks_done"] == 6
        # exactly-once accounting across the crash: 6 frames, one per chunk,
        # including the straddler whose head lived only in the checkpointed
        # carry at the crash point
        got = sorted(set(tally["decoded"]))
        assert len(tally["decoded"]) == len(got) == 6, tally
        assert got[0] in range(299, 302)

    def test_hung_worker_detected_and_restarted(self, tmp_path):
        wd = str(tmp_path)
        script = tmp_path / "worker.py"
        script.write_text(HANG_WORKER)
        events = []
        sup = Supervisor(
            [
                WorkerSpec(
                    name="hang0",
                    argv=[sys.executable, str(script), wd],
                    heartbeat_path=os.path.join(wd, "hb"),
                    stale_after_s=8.0,  # > package import time on this host
                    max_restarts=2,
                )
            ],
            on_event=lambda n, ev, d: events.append((ev, d)),
            env=_env(),
        )
        sup.start()
        summary = sup.run(poll_interval_s=0.25, timeout_s=120)[0]
        assert summary["restarts"] == 1 and summary["returncode"] == 0, (
            summary, events)
        assert any(ev == "stale" for ev, _ in events), events

    def test_restart_budget_exhaustion_gives_up(self, tmp_path):
        wd = str(tmp_path)
        script = tmp_path / "worker.py"
        script.write_text(FAIL_WORKER)
        sup = Supervisor(
            [
                WorkerSpec(
                    name="bad0",
                    argv=[sys.executable, str(script)],
                    heartbeat_path=os.path.join(wd, "hb"),
                    stale_after_s=30.0,
                    max_restarts=2,
                    backoff_s=0.05,
                )
            ],
            env=_env(),
        )
        sup.start()
        summary = sup.run(poll_interval_s=0.1, timeout_s=60)[0]
        assert summary["gave_up"] and summary["restarts"] == 2
