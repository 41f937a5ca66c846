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
