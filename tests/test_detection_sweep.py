"""BASELINE config 2: frame-detection sweep over AWGN with CFO/timing
offsets — statistical bounds, small N for CPU CI. The full FER/detection
characterization sweep is bench/fer_sweep.py (artifact bench/FER_SWEEP.json);
its small-N test twin is tests/test_fer_sweep.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.phy import detector, framegen

CFG = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)


def run_trials(n_trials, snr_db, cfo=0.0, frac_delay=0.0, seed=0):
    """Return (hits, position_errors) over n_trials single-frame blocks."""
    rng = np.random.default_rng(seed)
    payloads = rng.integers(0, 256, (n_trials, 64), dtype=np.uint8)
    frames = np.asarray(framegen.framegen(jnp.asarray(payloads), CFG))
    f = frames.shape[1]
    t = 4096
    offsets = rng.integers(200, t - f - 200, size=n_trials)
    x = np.zeros((n_trials, t), dtype=np.complex64)
    for i in range(n_trials):
        fr = frames[i]
        if frac_delay:
            # fractional delay via frequency-domain phase ramp
            n = np.fft.fftfreq(f)
            fr = np.fft.ifft(np.fft.fft(fr) * np.exp(-2j * np.pi * n * frac_delay))
        x[i, offsets[i] : offsets[i] + f] = fr
    tt = np.arange(t)
    x = x * np.exp(1j * cfo * tt)[None, :]
    p_sig = np.mean(np.abs(frames) ** 2)
    sigma = np.sqrt(p_sig / (2 * 10 ** (snr_db / 10)))
    x = (x + sigma * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))).astype(np.complex64)
    det = detector.detect(jnp.asarray(x), max_frames=2)
    mask = np.asarray(det.mask)
    starts = np.asarray(det.start)
    hits = 0
    pos_err = []
    for i in range(n_trials):
        ks = np.nonzero(mask[i])[0]
        best = None
        for k in ks:
            err = abs(int(starts[i, k]) - int(offsets[i]))
            if best is None or err < best:
                best = err
        if best is not None and best <= 2:
            hits += 1
            pos_err.append(best)
    return hits, pos_err


class TestDetectionSweep:
    @pytest.mark.parametrize("snr_db,min_rate", [(0, 0.5), (5, 0.9), (10, 1.0), (20, 1.0)])
    def test_detection_rate_vs_snr(self, snr_db, min_rate):
        n = 12
        hits, _ = run_trials(n, snr_db, seed=snr_db)
        assert hits >= min_rate * n, f"{hits}/{n} at {snr_db} dB"

    def test_detection_with_cfo(self):
        # CFO at the edge of the multi-bin range (~0.02 rad/sample)
        for cfo in (0.005, 0.01, 0.02):
            hits, _ = run_trials(8, 15, cfo=cfo, seed=int(cfo * 1e4))
            assert hits >= 7, f"cfo={cfo}: {hits}/8"

    def test_detection_with_fractional_timing(self):
        for frac in (0.25, 0.5):
            hits, _ = run_trials(8, 15, frac_delay=frac, seed=int(frac * 100))
            assert hits >= 7, f"frac={frac}: {hits}/8"

    def test_refined_header_decode_dominates_raw(self):
        """Pins sync_common's claim that decision-directed carrier
        refinement never loses a header the raw decode would recover
        (the raw-or-refined fallback was removed on this claim; ADVICE r1
        asked for a sweep regression guarding it)."""
        from liquiddsp_tpu.phy.frame_spec import FrameSpec
        from liquiddsp_tpu.phy.framesync import sync_common

        n_syms = FrameSpec(CFG).frame_syms
        rng = np.random.default_rng(321)
        n = 10
        payloads = rng.integers(0, 256, (n, 64), dtype=np.uint8)
        frames = np.asarray(framegen.framegen(jnp.asarray(payloads), CFG))
        f = frames.shape[1]
        for snr_db in (4.0, 6.0, 8.0, 12.0):
            x = np.zeros((n, f + 1024), dtype=np.complex64)
            offs = rng.integers(100, 900, size=n)
            for i in range(n):
                x[i, offs[i] : offs[i] + f] = frames[i]
            tt = np.arange(x.shape[1])
            x = x * np.exp(1j * 0.004 * tt)[None, :]
            sigma = np.sqrt(np.mean(np.abs(frames) ** 2) / (2 * 10 ** (snr_db / 10)))
            x = (
                x
                + sigma
                * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
            ).astype(np.complex64)
            counts = {}
            for refine in (False, True):
                det, _, (hv, *_rest), _evm = sync_common(
                    jnp.asarray(x), n_syms, 2, refine=refine
                )
                counts[refine] = int(np.sum(np.asarray(hv & det.mask)))
            assert counts[True] >= counts[False], (
                f"refined header decode lost frames at {snr_db} dB: "
                f"{counts[True]} < {counts[False]}"
            )

    def test_tau_estimate_tracks_fractional_delay(self):
        rng = np.random.default_rng(9)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        frame = np.asarray(framegen.framegen(jnp.asarray(payload), CFG))[0]
        f = len(frame)
        n = np.fft.fftfreq(f)
        taus = []
        for frac in (-0.3, 0.0, 0.3):
            fr = np.fft.ifft(np.fft.fft(frame) * np.exp(-2j * np.pi * n * frac))
            x = np.zeros((1, 4096), dtype=np.complex64)
            x[0, 500 : 500 + f] = fr
            det = detector.detect(jnp.asarray(x), max_frames=2)
            assert bool(np.asarray(det.mask)[0, 0])
            taus.append(float(np.asarray(det.tau)[0, 0]))
        # tau estimate should be monotone in the injected delay
        assert taus[0] < taus[1] < taus[2]


class TestHalfSampleTimingHeaders:
    """Regression for the fine-CFO timing bias (round 3): correlating the
    raw preamble window against the UNdelayed template biases the dual-half
    CFO slope by ~0.01*delta rad/sample, which at |delta|~0.5 drifts ~70 deg
    across the preamble->header gap and killed ~4% of headers at 10 dB
    (every FER_SWEEP header failure had |frac| >= 0.41). The delay-matched
    template bank (detector._delayed_templates) removes the bias; headers
    at half-sample timing + large CFO must all decode."""

    def test_headers_survive_half_sample_delay_with_cfo(self):
        from liquiddsp_tpu.phy.framesync import framesync_fixed

        rng = np.random.default_rng(77)
        n = 24
        payloads = rng.integers(0, 256, (n, 64), dtype=np.uint8)
        frames = np.asarray(framegen.framegen(jnp.asarray(payloads), CFG))
        f = frames.shape[1]
        t = 4096
        x = np.zeros((n, t), dtype=np.complex64)
        offs = rng.integers(200, t - f - 200, size=n)
        for i in range(n):
            x[i, offs[i] : offs[i] + f] = frames[i]
        # worst-case grid: frac in {-0.5, +0.5} x cfo in {-0.012, +0.012}
        fracs = np.where(np.arange(n) % 2 == 0, 0.5, -0.5)
        cfos = np.where((np.arange(n) // 2) % 2 == 0, 0.012, -0.012)
        freqs = np.fft.fftfreq(t)
        x = np.fft.ifft(
            np.fft.fft(x, axis=1) * np.exp(-2j * np.pi * freqs[None, :] * fracs[:, None]),
            axis=1,
        )
        tt = np.arange(t)
        x = x * np.exp(1j * cfos[:, None] * tt[None, :])
        sigma = np.sqrt(np.mean(np.abs(frames) ** 2) / (2 * 10 ** (10.0 / 10)))
        x = (
            x + sigma * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
        ).astype(np.complex64)
        res = framesync_fixed(jnp.asarray(x), CFG, max_frames=2)
        near = (np.abs(np.asarray(res.start) - offs[:, None]) <= 2) & np.asarray(res.mask)
        hdr = np.any(near & np.asarray(res.header_valid), axis=1)
        assert hdr.all(), f"headers lost at half-sample timing: {hdr.sum()}/{n}"
