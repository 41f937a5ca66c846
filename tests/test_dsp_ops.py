"""Tests for AGC, NCO and polyphase resampling ops."""

import numpy as np
import jax.numpy as jnp

from liquiddsp_tpu.ops import agc, nco, resample


class TestAGC:
    def test_block_normalizes_rms(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            (3.0 * (rng.standard_normal((2, 512)) + 1j * rng.standard_normal((2, 512)))).astype(
                np.complex64
            )
        )
        y, gain = agc.agc_block(x)
        rms = np.sqrt(np.mean(np.abs(np.asarray(y)) ** 2, axis=-1))
        np.testing.assert_allclose(rms, 1.0, rtol=1e-5)

    def test_windowed_tracks_level_change(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
        x[1024:] *= 10.0
        y, gain = agc.agc_windowed(jnp.asarray(x[None]), window=128)
        y = np.asarray(y)[0]
        # steady-state RMS ~1 in both halves (skip transients)
        r1 = np.sqrt(np.mean(np.abs(y[512:1024]) ** 2))
        r2 = np.sqrt(np.mean(np.abs(y[1536:]) ** 2))
        assert 0.8 < r1 < 1.2 and 0.8 < r2 < 1.2

    def test_scan_agc_converges(self):
        rng = np.random.default_rng(2)
        x = 5.0 * np.exp(1j * rng.uniform(0, 2 * np.pi, 2000)).astype(np.complex64)
        y, gain = agc.agc_scan(jnp.asarray(x[None]), alpha=0.05)
        tail = np.abs(np.asarray(y)[0, -200:])
        np.testing.assert_allclose(tail.mean(), 1.0, rtol=0.05)


class TestNCO:
    def test_mix_down_removes_cfo(self):
        rng = np.random.default_rng(3)
        base = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex64)
        cfo, phi = 0.03, 0.5
        n = np.arange(1024)
        x = base * np.exp(1j * (cfo * n + phi))
        y = nco.mix_down(jnp.asarray(x[None]), jnp.asarray([cfo]), jnp.asarray([phi]))
        np.testing.assert_allclose(np.asarray(y)[0], base, atol=1e-4)

    def test_pll_tracks_residual(self):
        rng = np.random.default_rng(4)
        ref = np.exp(1j * rng.integers(0, 4, 600) * np.pi / 2).astype(np.complex64)
        resid = 0.002
        syms = ref * np.exp(1j * (resid * np.arange(600)))
        out, traj = nco.pll_track(jnp.asarray(syms[None]), jnp.asarray(ref[None]), bw=0.05)
        err = np.angle(np.asarray(out)[0, -100:] * np.conj(ref[-100:]))
        assert np.max(np.abs(err)) < 0.05


class TestResample:
    def test_interp_preserves_signal(self):
        # a pure tone upsampled by 2 keeps its (rescaled) frequency
        n = np.arange(512)
        f = 0.05
        x = np.exp(2j * np.pi * f * n).astype(np.complex64)
        y = np.asarray(resample.interp(jnp.asarray(x[None]), 2))[0]
        assert len(y) == 1024
        spec = np.abs(np.fft.fft(y[100:900]))
        peak = np.argmax(spec) / 800
        np.testing.assert_allclose(peak, f / 2, atol=0.002)

    def test_decim_antialias(self):
        n = np.arange(2048)
        x = (np.exp(2j * np.pi * 0.02 * n) + 0.5 * np.exp(2j * np.pi * 0.4 * n)).astype(
            np.complex64
        )
        y = np.asarray(resample.decim(jnp.asarray(x[None]), 2))[0]
        spec = np.abs(np.fft.fft(y))
        # in-band tone survives at 0.04; the 0.4 tone (aliasing to 0.2) is cut
        keep = spec[int(0.04 * len(y))]
        alias = spec[int(0.2 * len(y))]
        assert keep > 10 * alias

    def test_rational_3_2(self):
        n = np.arange(600)
        x = np.exp(2j * np.pi * 0.03 * n).astype(np.complex64)
        y = np.asarray(resample.rational(jnp.asarray(x[None]), 3, 2))[0]
        assert len(y) == 900
        spec = np.abs(np.fft.fft(y[100:800]))
        peak = np.argmax(spec) / 700
        np.testing.assert_allclose(peak, 0.02, atol=0.002)

    def test_arbitrary_ratio(self):
        n = np.arange(1000)
        x = np.cos(2 * np.pi * 0.01 * n).astype(np.complex64)
        rate = 1.37
        out_len = int(900 * rate)
        y = np.asarray(resample.arbitrary(jnp.asarray(x[None]), rate, out_len))[0]
        # compare against direct evaluation of the underlying cosine
        pos = np.arange(out_len) / rate
        want = np.cos(2 * np.pi * 0.01 * pos)
        sel = (pos > 20) & (pos < 950)
        np.testing.assert_allclose(y.real[sel], want[sel], atol=5e-3)

    def test_arbitrary_ppm_farrow(self):
        """Near-unity rates take the Farrow fast path (polynomial-in-mu
        factorized bank, ops/resample.py): pin its accuracy against direct
        evaluation of a tone, for complex AND real inputs."""
        n = np.arange(4096)
        out_len = 4000
        for rate, cplx in [(1.0 + 50e-6, True), (1.0 + 50e-6, False),
                           (1.0 - 500e-6, True), (1.0 + 500e-6, True)]:
            pos = np.arange(out_len) / rate
            sel = (pos > 30) & (pos < 4000)
            if cplx:
                x = np.exp(2j * np.pi * 0.02 * n).astype(np.complex64)
                want = np.exp(2j * np.pi * 0.02 * pos)
            else:
                x = np.cos(2 * np.pi * 0.02 * n).astype(np.float32)
                want = np.cos(2 * np.pi * 0.02 * pos)
            y = np.asarray(resample.arbitrary(jnp.asarray(x[None]), rate, out_len))[0]
            assert y.dtype == x.dtype
            np.testing.assert_allclose(y[sel], want[sel], atol=5e-3)

    def test_arbitrary_groups_matches_per_rate(self):
        """arbitrary_groups (one shared Farrow conv over all channel
        groups) must match per-group arbitrary() calls; far-from-unity
        rates take the documented fallback and match exactly."""
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((8, 2048)) + 1j * rng.standard_normal((8, 2048))
             ).astype(np.complex64)
        out_len = 2000
        for rates in [(1.0 + 50e-6, 1.0 - 20e-6, 1.0 + 5e-6, 1.0 - 50e-6),
                      (1.25, 0.8)]:
            g = x.shape[0] // len(rates)
            got = np.asarray(resample.arbitrary_groups(jnp.asarray(x), rates, out_len))
            want = np.concatenate([
                np.asarray(resample.arbitrary(jnp.asarray(x[i * g:(i + 1) * g]),
                                              r, out_len))
                for i, r in enumerate(rates)
            ], axis=0)
            # shared path: the common anti-alias cutoff differs by O(ppm)
            # from each group's own — bank deltas up to ~6e-4, same order
            # as the Farrow fit's own 1e-3 residual bound
            np.testing.assert_allclose(got, want, atol=2e-3)


class TestCrc32:
    def test_matches_zlib(self):
        import zlib

        import jax.numpy as jnp

        from liquiddsp_tpu.ops import crc

        rng = np.random.default_rng(7)
        msgs = rng.integers(0, 256, (5, 33), dtype=np.uint8)
        got = np.asarray(crc.crc32(jnp.asarray(msgs)))
        want = np.array([zlib.crc32(bytes(m)) for m in msgs], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)
        assert crc.crc32_host(bytes(msgs[0])) == want[0]
