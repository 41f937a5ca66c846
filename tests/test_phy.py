"""PHY integration tests: framegen geometry, detector, TX->RX loopback.

The loopback fixture mirrors what the reference's empty QA stubs gesture at
(python/qa_flex_tx.py / qa_flex_rx.py; SURVEY.md section 4): message source ->
flex_tx -> channel -> flex_rx -> compare payloads. BASELINE config 1 (QPSK,
64-byte payload, 2 samp/sym RRC, noiseless) is the anchor case.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.phy import detector, frame_spec as fs, framegen
from liquiddsp_tpu.phy.framesync import framesync_fixed

QPSK_CFG = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)


def make_block(payload, cfg, offset, total_len, cfo=0.0, phase=0.0, gain=1.0, snr_db=None, seed=0):
    """Place one frame at ``offset`` inside a [1, total_len] noise-padded block."""
    frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
    b, n = frame.shape
    x = np.zeros((b, total_len), dtype=np.complex64)
    x[:, offset : offset + n] = frame
    t = np.arange(total_len)
    x = x * gain * np.exp(1j * (cfo * t + phase))
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        # signal power within the frame ~ gain^2 * mean|frame|^2
        p_sig = gain**2 * np.mean(np.abs(frame) ** 2)
        sigma = np.sqrt(p_sig / (2 * 10 ** (snr_db / 10)))
        x = x + sigma * (
            rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape)
        )
    return jnp.asarray(x.astype(np.complex64))


class TestFramegen:
    def test_shapes(self):
        spec = fs.FrameSpec(QPSK_CFG)
        payload = jnp.zeros((2, 64), dtype=jnp.uint8)
        wave = framegen.framegen(payload, QPSK_CFG)
        assert wave.shape == (2, spec.frame_samples)
        assert wave.dtype == jnp.complex64
        # QPSK no-FEC: (64+3)*8 bits -> 268 symbols
        assert spec.payload_syms == 268
        assert spec.frame_syms == 64 + 180 + 268
        assert spec.frame_samples == 2 * spec.frame_syms + 28

    def test_frame_length_varies_with_config(self):
        l1 = framegen.frame_length(QPSK_CFG)
        l2 = framegen.frame_length(
            FrameConfig(modulation=0, inner_code=1, outer_code=1, payload_len=64)
        )
        l3 = framegen.frame_length(
            FrameConfig(modulation=10, inner_code=0, outer_code=0, payload_len=64)
        )
        assert l2 > l1 > l3

    def test_preamble_prefix_data_independent(self):
        rng = np.random.default_rng(0)
        p1 = jnp.asarray(rng.integers(0, 256, (1, 64), dtype=np.uint8))
        p2 = jnp.asarray(rng.integers(0, 256, (1, 64), dtype=np.uint8))
        w1 = np.asarray(framegen.framegen(p1, QPSK_CFG))
        w2 = np.asarray(framegen.framegen(p2, QPSK_CFG))
        np.testing.assert_allclose(w1[0, :128], w2[0, :128], atol=1e-6)
        np.testing.assert_allclose(w1[0, :128], detector.template(), atol=1e-6)


class TestDetector:
    def test_detects_frame_position(self):
        rng = np.random.default_rng(1)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        x = make_block(payload, QPSK_CFG, offset=500, total_len=4096)
        det = detector.detect(x, max_frames=4)
        found = np.asarray(det.mask[0])
        starts = np.asarray(det.start[0])
        assert found[0]
        assert abs(int(starts[0]) - 500) <= 1
        # exactly one detection
        assert found.sum() == 1

    def test_no_false_alarm_on_noise(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            0.1
            * (rng.standard_normal((1, 4096)) + 1j * rng.standard_normal((1, 4096))).astype(
                np.complex64
            )
        )
        det = detector.detect(x, max_frames=4)
        assert np.asarray(det.mask).sum() == 0

    def test_estimates_gain_phase(self):
        rng = np.random.default_rng(3)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        x = make_block(payload, QPSK_CFG, offset=300, total_len=4096, gain=0.5, phase=0.7)
        det = detector.detect(x, max_frames=4)
        assert np.asarray(det.mask[0, 0])
        np.testing.assert_allclose(float(det.gamma[0, 0]), 0.5, rtol=0.1)
        np.testing.assert_allclose(float(det.phi[0, 0]), 0.7, atol=0.1)

    def test_estimates_cfo(self):
        rng = np.random.default_rng(4)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        cfo = 0.01  # rad/sample
        x = make_block(payload, QPSK_CFG, offset=300, total_len=4096, cfo=cfo)
        det = detector.detect(x, max_frames=4)
        assert np.asarray(det.mask[0, 0])
        np.testing.assert_allclose(float(det.dphi[0, 0]), cfo, atol=1.5e-3)

    def test_detects_at_moderate_snr(self):
        rng = np.random.default_rng(5)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        x = make_block(payload, QPSK_CFG, offset=700, total_len=4096, snr_db=10)
        det = detector.detect(x, max_frames=4)
        starts = np.asarray(det.start[0])
        assert np.asarray(det.mask[0]).any()
        assert min(abs(starts[np.asarray(det.mask[0])] - 700)) <= 1


class TestLoopback:
    """BASELINE config 1: noiseless QPSK loopback, bit-exact payload."""

    def _loopback(self, cfg, offset=256, total_len=4096, **chan):
        rng = np.random.default_rng(cfg.modulation * 100 + cfg.inner_code * 10 + cfg.outer_code)
        payload = rng.integers(0, 256, (1, cfg.payload_len), dtype=np.uint8)
        x = make_block(payload, cfg, offset=offset, total_len=total_len, **chan)
        res = framesync_fixed(x, cfg, max_frames=4)
        m = np.asarray(res.mask[0])
        assert m.any(), "no detection"
        slot = int(np.argmax(m))
        assert bool(res.header_valid[0, slot]), "header invalid"
        assert bool(res.payload_valid[0, slot]), "payload invalid"
        np.testing.assert_array_equal(np.asarray(res.payload[0, slot]), payload[0])
        assert int(res.modulation[0, slot]) == cfg.modulation
        assert int(res.inner_code[0, slot]) == cfg.inner_code
        assert int(res.outer_code[0, slot]) == cfg.outer_code

    def test_qpsk_noiseless(self):
        self._loopback(QPSK_CFG)

    @pytest.mark.parametrize("mod", range(11))
    def test_all_modulations_noiseless(self, mod):
        self._loopback(FrameConfig(modulation=mod, inner_code=0, outer_code=0, payload_len=64))

    @pytest.mark.parametrize("inner,outer", [(1, 0), (0, 1), (1, 1), (2, 3), (6, 7), (0, 2)])
    def test_fec_combos_noiseless(self, inner, outer):
        self._loopback(FrameConfig(modulation=1, inner_code=inner, outer_code=outer, payload_len=64))

    def test_with_gain_phase_offset(self):
        self._loopback(QPSK_CFG, gain=0.3, phase=1.1)

    def test_with_cfo(self):
        self._loopback(QPSK_CFG, cfo=0.005)

    def test_with_noise_20db(self):
        self._loopback(QPSK_CFG, snr_db=20)

    def test_two_frames_one_block(self):
        rng = np.random.default_rng(77)
        p1 = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        p2 = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        f1 = np.asarray(framegen.framegen(jnp.asarray(p1), QPSK_CFG))
        f2 = np.asarray(framegen.framegen(jnp.asarray(p2), QPSK_CFG))
        x = np.zeros((1, 8192), dtype=np.complex64)
        x[:, 100 : 100 + f1.shape[1]] = f1
        x[:, 4000 : 4000 + f2.shape[1]] = f2
        res = framesync_fixed(jnp.asarray(x), QPSK_CFG, max_frames=4)
        m = np.asarray(res.mask[0])
        assert m.sum() == 2
        starts = sorted(np.asarray(res.start[0])[m])
        assert abs(starts[0] - 100) <= 1 and abs(starts[1] - 4000) <= 1
        pv = np.asarray(res.payload_valid[0])
        assert pv.sum() == 2
        got = {bytes(np.asarray(res.payload[0, i])) for i in range(4) if m[i]}
        assert got == {bytes(p1[0]), bytes(p2[0])}


class TestCarrierTrackingRobustness:
    def test_fec_frames_at_10db_no_cycle_slips(self):
        """The bench FEC config (QPSK + V27 + Golay) at 10 dB: residual-CFO
        estimation error used to walk the extrapolated carrier past the
        QPSK decision boundary mid-payload — a cycle slip relabeling every
        later symbol, which no FEC survives. Fixed by the decision-free
        V&V refine (_refine_carrier) + linear-fit tracker (_dd_phase_track);
        regression: every non-straddling frame must decode bit-exactly."""
        cfg = FrameConfig(modulation=1, inner_code=1, outer_code=1, payload_len=64)
        rng = np.random.default_rng(42)
        batch, total = 6, 1 << 14
        f = framegen.frame_length(cfg)
        payloads = rng.integers(0, 256, (batch, 64), dtype=np.uint8)
        frames = np.asarray(framegen.framegen(jnp.asarray(payloads), cfg))
        gap = int(0.8 * f)
        starts = [37 + i * (37 + f + gap) for i in range(8) if 37 + i * (37 + f + gap) + f <= total]
        x = np.zeros((batch, total), dtype=np.complex64)
        for s in starts:
            x[:, s : s + f] = frames
        sigma = np.sqrt(np.mean(np.abs(frames) ** 2) / (2 * 10 ** (10.0 / 10)))
        x = (
            x + sigma * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
        ).astype(np.complex64)
        res = framesync_fixed(jnp.asarray(x), cfg, max_frames=len(starts) + 2)
        pv = np.asarray(res.payload_valid)
        ok = int(pv.sum())
        assert ok == batch * len(starts), f"{ok}/{batch * len(starts)} frames decoded"
        match = (np.asarray(res.payload) == payloads[:, None, :]).all(-1) & pv
        assert int(match.sum()) == ok, "decoded payloads not bit-exact"


class TestPayloadPhaseTracking:
    def test_long_frame_survives_cfo(self):
        """Long low-rate frames accumulate residual-CFO phase drift beyond
        what header-based refinement corrects; the segment-wise DD tracker
        (framesync._dd_phase_track) must hold coherence to the frame end.
        Regression: BPSK + V27 + Golay (≈2400 payload symbols) at CFO."""
        import jax.numpy as jnp

        from liquiddsp_tpu.core.config import FrameConfig
        from liquiddsp_tpu.phy import framegen
        from liquiddsp_tpu.phy.framesync import framesync_fixed

        cfg = FrameConfig(modulation=0, inner_code=1, outer_code=1, payload_len=64)
        rng = np.random.default_rng(11)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
        f = frame.shape[1]
        t = f + 1024
        x = np.zeros((1, t), dtype=np.complex64)
        x[0, 300 : 300 + f] = frame
        # CFO well inside the detector's bin range, SNR comfortable
        x = x * np.exp(1j * 0.003 * np.arange(t))[None, :]
        sigma = np.sqrt(np.mean(np.abs(frame) ** 2) / (2 * 10 ** (20 / 10)))
        x = (
            x + sigma * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
        ).astype(np.complex64)
        res = framesync_fixed(jnp.asarray(x), cfg, max_frames=2)
        ok = np.asarray(res.payload_valid)[0]
        assert ok.any()
        k = int(np.nonzero(ok)[0][0])
        np.testing.assert_array_equal(np.asarray(res.payload)[0, k], payload[0])
