"""Pallas kernel parity tests (interpret mode on CPU vs the XLA fallback)."""

import numpy as np
import jax.numpy as jnp

from liquiddsp_tpu.kernels import correlator
from liquiddsp_tpu.phy import detector


class TestCorrelatorKernel:
    def test_interpret_matches_xla(self):
        tmpl = detector.templates_time()
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, 3000)) + 1j * rng.standard_normal((2, 3000))).astype(
            np.complex64
        )
        x[0, 500:628] += 5 * detector.template()
        x[1, 1700:1828] += 3 * np.asarray(tmpl[3])  # frequency-shifted hit
        a = correlator.correlate_reduced(jnp.asarray(x), tmpl, backend="xla")
        b = correlator.correlate_reduced(jnp.asarray(x), tmpl, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(a["rho2"]), np.asarray(b["rho2"]), atol=1e-5)
        # XLA path computes energy via cumsum (cancellation at small values);
        # the Pallas kernel sums windows directly — compare loosely
        np.testing.assert_allclose(
            np.asarray(a["energy"]), np.asarray(b["energy"]), rtol=1e-3, atol=1e-2
        )
        peaks = np.asarray(a["rho2"]) > 0.04
        assert peaks.any()
        np.testing.assert_array_equal(
            np.asarray(a["fbin"])[peaks], np.asarray(b["fbin"])[peaks]
        )
        np.testing.assert_allclose(
            np.asarray(a["corr"])[peaks], np.asarray(b["corr"])[peaks], rtol=1e-4, atol=1e-4
        )

    def test_bf16_matches_f32_to_operating_precision(self):
        """The default TPU path runs bf16 matmul operands with f32
        accumulation; rho2/corr must stay within ~-40 dB of the f32 path —
        far below the 10-20 dB operating SNR of the detector."""
        tmpl = detector.templates_time()
        rng = np.random.default_rng(2)
        x = (
            rng.standard_normal((2, 3000)) + 1j * rng.standard_normal((2, 3000))
        ).astype(np.complex64)
        x[0, 500:628] += 5 * detector.template()
        x[1, 1700:1828] += 3 * np.asarray(tmpl[3])
        a = correlator.correlate_reduced(jnp.asarray(x), tmpl, backend="pallas_interpret")
        b = correlator.correlate_reduced(
            jnp.asarray(x), tmpl, backend="pallas_interpret_bf16"
        )
        scale = float(np.max(np.asarray(a["rho2"])))
        np.testing.assert_allclose(
            np.asarray(a["rho2"]), np.asarray(b["rho2"]), atol=0.02 * scale
        )
        np.testing.assert_allclose(
            np.asarray(a["energy"]), np.asarray(b["energy"]), rtol=2e-2, atol=1e-2
        )
        # at genuine peaks the reduced quantities must agree closely
        peaks = np.asarray(a["rho2"]) > 0.5
        assert peaks.any()
        np.testing.assert_array_equal(
            np.asarray(a["fbin"])[peaks], np.asarray(b["fbin"])[peaks]
        )
        np.testing.assert_allclose(
            np.asarray(a["corr"])[peaks], np.asarray(b["corr"])[peaks], rtol=2e-2
        )

    def test_detect_same_results_via_pallas_interpret_bf16(self):
        """End-to-end detect() with the bf16 kernel: identical mask/start to
        the XLA f32 path on a clean frame (detection decisions are threshold
        compares ~3 orders of magnitude above bf16 rounding)."""
        from liquiddsp_tpu.core.config import FrameConfig
        from liquiddsp_tpu.phy import framegen

        cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
        rng = np.random.default_rng(7)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
        x = np.zeros((1, 4096), dtype=np.complex64)
        x[0, 777 : 777 + frame.shape[1]] = frame
        x += (0.05 * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))).astype(
            np.complex64
        )
        d_xla = detector.detect(jnp.asarray(x), max_frames=2, backend="xla")
        d_pal = detector.detect(
            jnp.asarray(x), max_frames=2, backend="pallas_interpret_bf16"
        )
        np.testing.assert_array_equal(np.asarray(d_xla.mask), np.asarray(d_pal.mask))
        np.testing.assert_array_equal(np.asarray(d_xla.start), np.asarray(d_pal.start))
        np.testing.assert_allclose(
            np.asarray(d_xla.gamma), np.asarray(d_pal.gamma), rtol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(d_xla.tau), np.asarray(d_pal.tau), atol=0.06
        )

    def test_detect_same_results_via_pallas_interpret(self):
        from liquiddsp_tpu.core.config import FrameConfig
        from liquiddsp_tpu.phy import framegen

        cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
        rng = np.random.default_rng(1)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
        x = np.zeros((1, 4096), dtype=np.complex64)
        x[0, 777 : 777 + frame.shape[1]] = frame
        d_xla = detector.detect(jnp.asarray(x), max_frames=2, backend="xla")
        d_pal = detector.detect(jnp.asarray(x), max_frames=2, backend="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(d_xla.mask), np.asarray(d_pal.mask))
        np.testing.assert_array_equal(np.asarray(d_xla.start), np.asarray(d_pal.start))
        np.testing.assert_allclose(
            np.asarray(d_xla.gamma), np.asarray(d_pal.gamma), rtol=1e-4
        )


class TestRecoverKernel:
    """Fused derotate+MF kernel (kernels/recover.py) vs the XLA slice-FMA
    formulation (framesync.symbols_from_windows)."""

    def _make_case(self, seed=0, b=2, k=3, n_syms=200):
        import jax.numpy as jnp
        from liquiddsp_tpu.phy import frame_spec as fs
        from liquiddsp_tpu.phy.detector import Detections

        rng = np.random.default_rng(seed)
        n_samples = fs.K_SAMP * n_syms + fs.PULSE_TAIL
        nd = -(-n_samples // 128) * 128
        win = (
            rng.standard_normal((b, k, n_samples))
            + 1j * rng.standard_normal((b, k, n_samples))
        ).astype(np.complex64)
        det = Detections(
            mask=jnp.ones((b, k), bool),
            start=jnp.zeros((b, k), jnp.int32),
            rho=jnp.ones((b, k), jnp.float32),
            gamma=jnp.asarray(rng.uniform(0.5, 2.0, (b, k)), jnp.float32),
            dphi=jnp.asarray(rng.uniform(-0.05, 0.05, (b, k)), jnp.float32),
            phi=jnp.asarray(rng.uniform(-np.pi, np.pi, (b, k)), jnp.float32),
            tau=jnp.asarray(rng.uniform(-0.5, 0.5, (b, k)), jnp.float32),
        )
        wp = np.zeros((b, k, nd), np.complex64)
        wp[..., :n_samples] = win
        return win, wp, det, n_syms

    def test_matches_symbols_from_windows(self):
        import jax.numpy as jnp
        from liquiddsp_tpu.kernels.recover import recover_symbols_planes
        from liquiddsp_tpu.phy.framesync import _candidate_taps30, symbols_from_windows

        win, wp, det, n_syms = self._make_case()
        ref = np.asarray(symbols_from_windows(jnp.asarray(win), det, n_syms))
        got = np.asarray(
            recover_symbols_planes(
                jnp.asarray(np.real(wp)),
                jnp.asarray(np.imag(wp)),
                det.dphi,
                det.phi,
                det.gamma,
                _candidate_taps30(det, True),
                n_syms,
                interpret=True,
            )
        )
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-4 * scale)

    def test_framesync_fused_interpret_decodes_same(self, monkeypatch):
        """End-to-end: framesync_fixed with the fused recovery backend
        decodes the same frames, bit-exactly, as the XLA backend."""
        import jax.numpy as jnp
        from liquiddsp_tpu.core.config import FrameConfig
        from liquiddsp_tpu.phy import framegen
        from liquiddsp_tpu.phy.framesync import framesync_fixed

        cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
        rng = np.random.default_rng(11)
        payload = rng.integers(0, 256, (1, 64), dtype=np.uint8)
        frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
        x = np.zeros((1, 4096), dtype=np.complex64)
        x[0, 301 : 301 + frame.shape[1]] = frame * np.exp(1j * 0.7)
        x += (0.03 * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))).astype(
            np.complex64
        )
        monkeypatch.setenv("LIQUIDDSP_RECOVER_BACKEND", "xla")
        r_ref = framesync_fixed(jnp.asarray(x), cfg, max_frames=2)
        monkeypatch.setenv("LIQUIDDSP_RECOVER_BACKEND", "fused_interpret")
        r_fus = framesync_fixed(jnp.asarray(x), cfg, max_frames=2)
        np.testing.assert_array_equal(
            np.asarray(r_ref.payload_valid), np.asarray(r_fus.payload_valid)
        )
        assert np.asarray(r_ref.payload_valid).any()
        np.testing.assert_array_equal(
            np.asarray(r_ref.payload), np.asarray(r_fus.payload)
        )


class TestExtractKernel:
    """Pallas DMA window extractor (kernels/extract.py) vs XLA fallback."""

    def test_interpret_matches_xla(self):
        from liquiddsp_tpu.kernels.extract import extract_windows, extract_windows_xla

        rng = np.random.default_rng(0)
        x = (
            rng.standard_normal((3, 2500)) + 1j * rng.standard_normal((3, 2500))
        ).astype(np.complex64)
        starts = rng.integers(0, 2499, (3, 7)).astype(np.int32)
        n = 300  # not a lane multiple — exercises padding/trim
        a = extract_windows(jnp.asarray(x), jnp.asarray(starts), n, backend="xla")
        b = extract_windows(
            jnp.asarray(x), jnp.asarray(starts), n, backend="pallas_interpret"
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_edge_start_reads_zero_pad(self):
        from liquiddsp_tpu.kernels.extract import extract_windows

        x = jnp.ones((1, 200), jnp.complex64)
        starts = jnp.asarray([[150]], jnp.int32)
        for backend in ("xla", "pallas_interpret"):
            w = np.asarray(extract_windows(x, starts, 128, backend=backend))
            assert w[0, 0, :50].real.all() and not w[0, 0, 50:].any()
