"""Pod-scale streaming test (BASELINE config 5 miniature on the 8-device
CPU mesh): continuous time-sharded RX, frames straddling both shard and
super-block boundaries, psum'd metrics."""

import numpy as np
import jax
import jax.numpy as jnp

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.parallel.mesh import make_mesh
from liquiddsp_tpu.phy import framegen
from liquiddsp_tpu.runtime.distributed_stream import ShardedStreamingRx

QPSK_CFG = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)


class TestShardedStreaming:
    def test_continuous_sharded_rx(self):
        mesh = make_mesh(n_time=8, n_ch=1)
        rng = np.random.default_rng(0)
        payloads = rng.integers(0, 256, (5, 64), dtype=np.uint8)
        frames = np.asarray(framegen.framegen(jnp.asarray(payloads), QPSK_CFG))
        f = frames.shape[1]
        chunk = 16384
        t = 3 * chunk
        # frame placements: mid-shard, shard boundary, super-block boundary x2
        shard_len = (chunk + f - 1 + ((-(chunk + f - 1)) % 8)) // 8
        starts = [
            1000,                      # mid first shard
            shard_len * 3 - f // 2,    # shard boundary inside block 1
            chunk - f // 2,            # super-block 1 -> 2 boundary
            2 * chunk - f + 37,        # super-block 2 -> 3 boundary (tail)
            2 * chunk + 5000,          # inside block 3
        ]
        stream = np.zeros((1, t), dtype=np.complex64)
        for s, fr in zip(starts, frames):
            stream[0, s : s + f] += fr

        rx = ShardedStreamingRx(QPSK_CFG, mesh, batch=1, chunk_len=chunk,
                                max_frames_per_shard=4)
        got = []
        total_detected = 0
        for pos in range(0, t, chunk):
            res, metrics = rx.step(jnp.asarray(stream[:, pos : pos + chunk]))
            total_detected += int(metrics.frames_detected)
            m = np.asarray(res.mask)[0]
            for k in np.nonzero(m)[0]:
                got.append(
                    (int(np.asarray(res.start)[0, k]),
                     bytes(np.asarray(res.payload)[0, k]),
                     bool(np.asarray(res.payload_valid)[0, k]))
                )
        assert len(got) == 5, got
        assert total_detected == 5
        got.sort()
        order = np.argsort(starts)
        for (s_got, p_got, valid), idx in zip(got, order):
            assert abs(s_got - starts[idx]) <= 1
            assert valid
            assert p_got == bytes(payloads[idx])
