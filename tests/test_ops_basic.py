"""Unit tests for the base ops: msequence, CRC, RRC taps, modems, FIR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liquiddsp_tpu.core.config import MOD_BPS, NUM_MODULATIONS
from liquiddsp_tpu.ops import crc, fir, modem, msequence, rrc


class TestMsequence:
    def test_period_127(self):
        bits = msequence.msequence_bits(7, 0x0089, 1, 254)
        # m-sequence of degree 7 has period 127
        assert np.array_equal(bits[:127], bits[127:254])
        # balanced: 64 ones, 63 zeros per period
        assert bits[:127].sum() == 64

    def test_preamble_shape_and_levels(self):
        p = msequence.preamble_symbols()
        assert p.shape == (64,)
        assert p.dtype == np.complex64
        np.testing.assert_allclose(np.abs(p), 1.0, rtol=1e-6)
        # QPSK points only
        assert set(np.round(p.real * np.sqrt(2)).astype(int)) <= {-1, 1}

    def test_deterministic(self):
        assert np.array_equal(msequence.preamble_symbols(), msequence.preamble_symbols())


class TestCRC:
    def test_crc24_known_vector(self):
        # CRC-24/OPENPGP check value for b"123456789" is 0x21CF02
        assert crc.crc24_host(b"123456789") == 0x21CF02

    def test_crc24_jax_matches_host(self):
        rng = np.random.default_rng(0)
        msgs = rng.integers(0, 256, size=(8, 40), dtype=np.uint8)
        got = np.asarray(crc.crc24(jnp.asarray(msgs)))
        want = np.array([crc.crc24_host(bytes(m)) for m in msgs], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_crc24_append_check_roundtrip(self):
        rng = np.random.default_rng(1)
        msgs = jnp.asarray(rng.integers(0, 256, size=(4, 64), dtype=np.uint8))
        framed = crc.crc24_append(msgs)
        assert framed.shape == (4, 67)
        assert bool(jnp.all(crc.crc24_check(framed)))
        # flip one bit -> fail
        bad = framed.at[0, 10].set(framed[0, 10] ^ 1)
        assert not bool(crc.crc24_check(bad)[0])

    def test_crc16_known_vector(self):
        # CRC-16/CCITT-FALSE check value for b"123456789" is 0x29B1
        assert crc.crc16_host(b"123456789") == 0x29B1


class TestRRC:
    def test_taps_shape_unit_energy(self):
        h = rrc.matched_taps()
        assert h.shape == (2 * rrc.K * rrc.M + 1,)
        np.testing.assert_allclose(np.sum(h * h), 1.0, rtol=1e-6)

    def test_nyquist_isi(self):
        # composite (h * h) must be ~ISI-free at symbol spacing k
        h = rrc.matched_taps().astype(np.float64)
        g = np.convolve(h, h)
        center = len(g) // 2
        peak = g[center]
        np.testing.assert_allclose(peak, 1.0, atol=1e-3)
        isi = g[center % rrc.K :: rrc.K]
        isi = isi[isi != peak]
        assert np.max(np.abs(isi)) < 5e-3

    def test_fractional_bank_shifts(self):
        bank = rrc.fractional_delay_bank(num_phases=4)
        assert bank.shape == (4, 29)
        # each phase has unit energy
        np.testing.assert_allclose((bank**2).sum(axis=1), 1.0, rtol=1e-5)


class TestModem:
    @pytest.mark.parametrize("mod", range(NUM_MODULATIONS))
    def test_mod_demod_roundtrip(self, mod):
        rng = np.random.default_rng(mod)
        bps = MOD_BPS[mod]
        idx = jnp.asarray(rng.integers(0, 1 << bps, size=(3, 50)))
        syms = modem.modulate(idx, mod)
        assert syms.dtype == jnp.complex64
        got = modem.demod_hard(syms, mod)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(idx))

    @pytest.mark.parametrize("mod", range(NUM_MODULATIONS))
    def test_unit_average_energy(self, mod):
        c = modem.constellation(mod)
        np.testing.assert_allclose(np.mean(np.abs(c) ** 2), 1.0, rtol=1e-5)

    @pytest.mark.parametrize("mod", range(NUM_MODULATIONS))
    def test_noisy_roundtrip(self, mod):
        # high SNR: hard decisions still exact
        rng = np.random.default_rng(100 + mod)
        bps = MOD_BPS[mod]
        idx = jnp.asarray(rng.integers(0, 1 << bps, size=(2, 64)))
        syms = modem.modulate(idx, mod)
        noise = 0.01 * (
            rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape)
        ).astype(np.complex64)
        got = modem.demod_hard(syms + noise, mod)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(idx))

    def test_bits_indices_roundtrip(self):
        rng = np.random.default_rng(7)
        for bps in (1, 2, 3, 4, 5, 6):
            bits = jnp.asarray(rng.integers(0, 2, size=(2, 12 * bps)), dtype=jnp.int8)
            idx = modem.bits_to_indices(bits, bps)
            back = modem.indices_to_bits(idx, bps)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))

    def test_soft_bits_sign_matches_hard(self):
        for mod in (0, 1, 8):
            rng = np.random.default_rng(mod)
            bps = MOD_BPS[mod]
            idx = jnp.asarray(rng.integers(0, 1 << bps, size=(1, 32)))
            syms = modem.modulate(idx, mod)
            llr = modem.demod_soft_bits(syms, mod)
            hard_bits = modem.indices_to_bits(modem.demod_hard(syms, mod), bps)
            # convention: positive LLR = bit 0 more likely, so bit = (llr < 0)
            np.testing.assert_array_equal(
                (np.asarray(llr) < 0).astype(np.int8), np.asarray(hard_bits)
            )


class TestFIR:
    def test_conv_full_matches_numpy(self):
        rng = np.random.default_rng(2)
        x = (rng.standard_normal((3, 50)) + 1j * rng.standard_normal((3, 50))).astype(
            np.complex64
        )
        h = rrc.matched_taps()
        got = np.asarray(fir.conv_full(jnp.asarray(x), h))
        for b in range(3):
            want = np.convolve(x[b], h)
            np.testing.assert_allclose(got[b], want, atol=1e-4)

    def test_interp_full_matches_manual_upsample(self):
        rng = np.random.default_rng(3)
        syms = (rng.standard_normal((2, 20)) + 1j * rng.standard_normal((2, 20))).astype(
            np.complex64
        )
        h = rrc.matched_taps()
        k = 2
        got = np.asarray(fir.interp_full(jnp.asarray(syms), h, k))
        assert got.shape == (2, k * 20 + len(h) - 1)
        for b in range(2):
            up = np.zeros(k * 20, dtype=np.complex64)
            up[::k] = syms[b]
            want = np.convolve(up, h)
            np.testing.assert_allclose(got[b], want, atol=1e-4)

    def test_tx_rx_symbol_recovery(self):
        """interp at k=2 + matched filter + decimate recovers symbols (ISI-free)."""
        rng = np.random.default_rng(4)
        syms = (rng.standard_normal((1, 64)) + 1j * rng.standard_normal((1, 64))).astype(
            np.complex64
        )
        h = rrc.matched_taps()
        k = 2
        tx = fir.interp_full(jnp.asarray(syms), h, k)
        recovered = fir.matched_filter_decimate(tx, h, k, offset=len(h) - 1)
        got = np.asarray(recovered)[0, :64]
        # the 29-tap truncated RRC is not perfectly Nyquist: its self-ISI
        # floor is ~1% of symbol amplitude (measured 0.011 worst-case on
        # this seed); the tolerance sits just above that floor
        np.testing.assert_allclose(got, syms[0], atol=2e-2)
