"""Symbol-timing (SFO) tracking tests: TX/RX sample-clock offset.

liquid's flexframesync runs a polyphase-filterbank timing-recovery loop
through the whole frame (SURVEY.md section 2.2 AGC/NCO/symbol-sync row);
the static per-frame tau of round 1 walks off the symbol grid on long
frames (0.35+ samples at 50 ppm over a ~7000-sample frame). These tests
pin the block-dense tracker (phy/framesync._sfo_recover):

- bit-exact decode at +-50 ppm on long frames where the static path fails;
- >= 8 dB tail-symbol EVM improvement at 50 ppm;
- no regression at 0 ppm with tracking forced on.

SFO is injected with the framework's own arbitrary-ratio polyphase
resampler (ops/resample.py), i.e. an actually stretched waveform — not a
phase-ramp approximation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.ops import resample
from liquiddsp_tpu.phy import framegen, frame_spec as fs
from liquiddsp_tpu.phy.framesync import framesync_fixed

LONG_QPSK = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=800)
LONG_BPSK_FEC = FrameConfig(modulation=0, inner_code=1, outer_code=2, payload_len=200)
T = 16384


def make_sfo_block(payload, cfg, ppm, offset=300, snr_db=None, cfo=0.004, phase=0.7, seed=0):
    frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
    x = np.zeros((1, T), dtype=np.complex64)
    x[:, offset : offset + frame.shape[1]] = frame
    if ppm:
        rate = 1.0 / (1.0 + ppm * 1e-6)
        x = np.asarray(resample.arbitrary(jnp.asarray(x), rate, T))
    t = np.arange(T)
    x = x * np.exp(1j * (cfo * t + phase))
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        p_sig = np.mean(np.abs(frame) ** 2)
        sigma = np.sqrt(p_sig / (2 * 10 ** (snr_db / 10)))
        x = x + sigma * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
    return jnp.asarray(x.astype(np.complex64))


def decode_ok(res, payload):
    ok = np.asarray(res.payload_valid[0])
    if not ok.any():
        return False
    k = int(np.argmax(ok))
    return bool((np.asarray(res.payload[0, k]) == payload[0]).all())


class TestSFO:
    @pytest.mark.parametrize("ppm", [50.0, -50.0])
    def test_long_frame_decodes_at_50ppm(self, ppm):
        """Long QPSK frame (~6900 samples, 0.35-sample drift at 50 ppm):
        the default (auto) path must track and decode bit-exactly."""
        rng = np.random.default_rng(21)
        payload = rng.integers(0, 256, (1, 800), dtype=np.uint8)
        x = make_sfo_block(payload, LONG_QPSK, ppm, snr_db=25.0, seed=int(abs(ppm)))
        res = framesync_fixed(x, LONG_QPSK, max_frames=2)  # track_sfo="auto"
        assert decode_ok(res, payload), f"tracked decode failed at {ppm} ppm"

    def test_tracking_is_load_bearing(self):
        """A dense-constellation long frame (QAM16, 1200 bytes, 0.27-sample
        drift at 50 ppm) must FAIL with tracking forced off and decode with
        it on — otherwise the 50 ppm tests prove nothing."""
        cfg = FrameConfig(modulation=8, inner_code=0, outer_code=0, payload_len=1200)
        rng = np.random.default_rng(31)
        payload = rng.integers(0, 256, (1, 1200), dtype=np.uint8)
        x = make_sfo_block(payload, cfg, 50.0, snr_db=28.0, seed=4)
        assert decode_ok(framesync_fixed(x, cfg, max_frames=2), payload)
        assert not decode_ok(
            framesync_fixed(x, cfg, max_frames=2, track_sfo=False), payload
        )

    def test_auto_threshold_engages(self):
        spec = fs.FrameSpec(LONG_QPSK)
        from liquiddsp_tpu.phy.framesync import SFO_AUTO_SYMS

        assert spec.frame_syms >= SFO_AUTO_SYMS

    def test_tail_evm_improvement(self):
        """Noiseless +50 ppm on the long BPSK+V27+RS class: tracking must
        recover >= 8 dB of tail-symbol EVM vs the static path."""
        rng = np.random.default_rng(5)
        payload = rng.integers(0, 256, (1, 200), dtype=np.uint8)
        spec = fs.FrameSpec(LONG_BPSK_FEC)
        tx_syms = np.asarray(framegen.assemble_symbols(jnp.asarray(payload), LONG_BPSK_FEC))[0]
        x = make_sfo_block(payload, LONG_BPSK_FEC, 50.0)

        def tail_evm(res, n=400):
            k = int(np.argmax(np.asarray(res.mask[0])))
            rx = np.asarray(res.symbols[0, k, : spec.frame_syms])
            e = rx[-n:] - tx_syms[-n:]
            return 10 * np.log10(
                np.mean(np.abs(e) ** 2) / np.mean(np.abs(tx_syms[-n:]) ** 2) + 1e-12
            )

        static = tail_evm(framesync_fixed(x, LONG_BPSK_FEC, max_frames=2, track_sfo=False))
        tracked = tail_evm(framesync_fixed(x, LONG_BPSK_FEC, max_frames=2, track_sfo=True))
        assert tracked <= static - 8.0, f"tracked {tracked:.1f} vs static {static:.1f} dB"

    def test_no_regression_at_zero_ppm(self):
        rng = np.random.default_rng(23)
        payload = rng.integers(0, 256, (1, 800), dtype=np.uint8)
        x = make_sfo_block(payload, LONG_QPSK, 0.0, snr_db=20.0, seed=9)
        res = framesync_fixed(x, LONG_QPSK, max_frames=2, track_sfo=True)
        assert decode_ok(res, payload)
