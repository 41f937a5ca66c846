"""Tests for the native C++ streaming runtime (native/sdr_runtime.cpp via
liquiddsp_tpu/runtime/native.py): ring-buffer wraparound + overlap-carry
semantics, message queue ordering/bounds, threaded source end-to-end, and
the chunked front-end feeding the streaming RX contract."""

import numpy as np
import pytest

from liquiddsp_tpu.runtime.native import (
    Counters,
    MessageQueue,
    NativeChunkSource,
    RingBuffer,
    StreamSource,
)


class TestRingBuffer:
    def test_write_read_roundtrip(self):
        rb = RingBuffer(1024)
        data = np.arange(100, dtype=np.uint8)
        assert rb.write(data) == 100
        assert rb.readable == 100
        out = rb.read_overlap(100, 0)
        np.testing.assert_array_equal(out, data)
        assert rb.readable == 0

    def test_wraparound(self):
        rb = RingBuffer(256)  # rounds to 256
        for it in range(10):
            data = np.full(200, it, dtype=np.uint8)
            assert rb.write(data) == 200
            out = rb.read_overlap(200, 0)
            np.testing.assert_array_equal(out, data)

    def test_overlap_carry(self):
        """read(n, overlap=m) re-reads the last m bytes next time — the
        frame-straddle carry contract of the streaming RX."""
        rb = RingBuffer(1024)
        rb.write(np.arange(300, dtype=np.uint16).view(np.uint8))
        a = rb.read_overlap(200, 40)
        b = rb.read_overlap(200, 40)
        np.testing.assert_array_equal(a[160:], b[:40])

    def test_partial_write_backpressure(self):
        rb = RingBuffer(128)
        wrote = rb.write(np.zeros(200, dtype=np.uint8))
        assert wrote == 128  # full: partial write
        assert rb.writable == 0

    def test_read_underflow_returns_none(self):
        rb = RingBuffer(128)
        rb.write(np.zeros(10, dtype=np.uint8))
        assert rb.read_overlap(64, 0) is None


class TestMessageQueue:
    def test_fifo_order(self):
        mq = MessageQueue()
        for i in range(5):
            assert mq.put({"seq": i})
        assert len(mq) == 5
        for i in range(5):
            assert mq.get()["seq"] == i
        assert mq.get() is None

    def test_bounded_drop(self):
        mq = MessageQueue(max_msgs=2)
        assert mq.put({"a": 1}) and mq.put({"a": 2})
        assert not mq.put({"a": 3})
        assert mq.dropped == 1

    def test_timeout_get(self):
        mq = MessageQueue()
        assert mq.get(timeout_ms=50) is None


class TestStreamSource:
    def test_threaded_feed(self):
        rb = RingBuffer(1 << 16)
        samples = (np.arange(5000) % 251).astype(np.uint8)
        src = StreamSource(rb, samples)
        got = []
        import time

        deadline = time.time() + 5
        while sum(len(g) for g in got) < 5000 and time.time() < deadline:
            r = rb.read_overlap(1000, 0)
            if r is not None:
                got.append(r)
        src.stop()
        out = np.concatenate(got)
        np.testing.assert_array_equal(out[:5000], samples)


class TestCounters:
    def test_counters(self):
        c = Counters(["frames", "errors"])
        c.add("frames", 5)
        c.add("frames")
        c.add("errors", 2)
        assert c.report() == {"frames": 6, "errors": 2}


class TestNativeChunkSource:
    def test_chunked_stream_with_overlap(self):
        n, chunk, ov = 4096, 1024, 128
        x = (np.random.default_rng(0).standard_normal(n) * (1 + 0j)).astype(
            np.complex64
        )
        srcq = NativeChunkSource(x, chunk_len=chunk, overlap=ov)
        chunks = list(srcq.chunks())
        assert len(chunks) >= 3
        # consecutive chunks re-read `ov` samples
        np.testing.assert_array_equal(chunks[0][-ov:], chunks[1][:ov])
        # reassembled stream (dropping carries) matches the source prefix
        flat = np.concatenate([chunks[0]] + [c[ov:] for c in chunks[1:]])
        np.testing.assert_array_equal(flat, x[: len(flat)])

    def test_feeds_streaming_rx(self):
        """End-to-end: native chunker -> StreamingRx decodes frames that
        straddle chunk boundaries."""
        import jax.numpy as jnp

        from liquiddsp_tpu.core.config import FrameConfig
        from liquiddsp_tpu.phy import framegen
        from liquiddsp_tpu.phy.frame_spec import FrameSpec
        from liquiddsp_tpu.runtime.stream import StreamingRx

        cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=32)
        spec = FrameSpec(cfg)
        rng = np.random.default_rng(3)
        payloads = rng.integers(0, 256, (3, 32), dtype=np.uint8)
        frames = np.asarray(framegen.framegen(jnp.asarray(payloads), cfg))
        chunk = 2048
        x = np.zeros(3 * chunk, dtype=np.complex64)
        # place one frame straddling each chunk boundary
        f = frames.shape[1]
        # straddle both chunk boundaries + one clear of the second frame's
        # tail (starts must be >= f apart — overlapping frames corrupt)
        starts = [chunk - f // 2, 2 * chunk - f // 2, 2 * chunk + f]
        for i, s in enumerate(starts):
            x[s : s + f] = frames[i]

        # StreamingRx keeps its own carry state; the native source feeds
        # plain non-overlapping chunks (overlap=0)
        rx = StreamingRx(cfg, batch=1, chunk_len=chunk, max_frames_per_chunk=4)
        src = NativeChunkSource(x, chunk_len=chunk, overlap=0)
        recovered = []
        for c in src.chunks():
            res = rx.step(jnp.asarray(c[None, :]))
            ok = np.asarray(res.payload_valid)[0]
            for k in np.nonzero(ok)[0]:
                recovered.append(np.asarray(res.payload)[0, k])
        assert len(recovered) == 3
        got = {bytes(r) for r in recovered}
        want = {bytes(p) for p in payloads}
        assert got == want
