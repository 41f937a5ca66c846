#!/usr/bin/env python
"""Payload FER-vs-SNR characterization sweep (BASELINE configs 1-2 contract).

For a set of representative configs spanning the 616-arm space
(BPSK -> QAM64 x inner {none, V27, P23, P78} x outer {none, Golay, RS,
Hamming74}), measures over N trials per SNR point:

- detection rate (preamble found within +/-2 samples),
- header decode rate,
- payload frame-error rate (CRC pass AND bit-exact vs TX).

Each trial is one frame in a 4096-sample block with randomized payload,
integer offset, carrier phase, gain, CFO (within the detector's bin range)
and fractional timing — the impairment set of liquid's flexframesync
contract (SURVEY.md section 2.2).

Usage:
    python bench/fer_sweep.py --cpu --trials 64        # quick CPU run
    python bench/fer_sweep.py --trials 512             # TPU, full sweep
    python bench/fer_sweep.py --out bench/FER_SWEEP.json

Writes a JSON artifact (default bench/FER_SWEEP.json) with one record per
(config, snr): {"config", "snr_db", "n", "det", "hdr", "fer"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


# (modulation, inner, outer, label, impairment) — spans the modem family and
# the FEC families (conv + punctured, Golay, RS, Hamming) per VERDICT r1
# item 3; round 3 adds a long-frame row (>=2200 frame symbols, the SFO
# tracker auto-engages + 40 ppm real clock offset via the arbitrary
# resampler) and a static-multipath row (per-trial random 1-symbol echo,
# the LMMSE EQ path) so the round-2 machinery shows up in the recorded
# statistical artifact, not only in unit tests.
CONFIGS = [
    (0, 0, 0, "bpsk", None),
    (1, 0, 0, "qpsk", None),
    (1, 1, 0, "qpsk_v27", None),
    (1, 1, 1, "qpsk_v27_golay", None),
    (1, 6, 0, "qpsk_p78", None),
    (5, 1, 0, "dqpsk_v27", None),
    (8, 0, 0, "qam16", None),
    (8, 1, 2, "qam16_v27_rs", None),
    (10, 0, 0, "qam64", None),
    (10, 2, 3, "qam64_p23_h74", None),
    (0, 1, 1, "bpsk_v27_golay_long_sfo40", "sfo40"),
    (1, 0, 0, "qpsk_multipath", "multipath"),
    # per-frame-tracker scope boundary rows (docs/ARCHITECTURE.md:108-141):
    # Rayleigh flat fading at two coherence times — ~2x the frame length
    # (near-static: the per-frame gamma/phase fit still holds) and ~0.5x
    # (the documented scope cut: gain/phase move WITHIN the frame) — plus a
    # +-30% linear amplitude ramp across the frame (pure static-gain
    # violation, no phase dynamics)
    (1, 0, 0, "qpsk_fading_tc2.0", "fading2.0"),
    (1, 0, 0, "qpsk_fading_tc0.5", "fading0.5"),
    # same sub-frame-coherence channel, coded: the uncoded tc0.5 residual
    # is deep fades WITHIN the payload (docs/ARCHITECTURE.md) — V27+Golay
    # spreads each bit across the frame, so this row records the coded
    # operating point the engine would actually pick under fast fading
    (1, 1, 1, "qpsk_v27_golay_fading_tc0.5", "fading0.5"),
    (1, 0, 0, "qpsk_ramp30", "ramp"),
]

SNR_GRID = [0.0, 2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 20.0, 25.0, 30.0]
BLOCK = 4096


def _qfunc(x: float) -> float:
    import math

    return 0.5 * math.erfc(x / math.sqrt(2.0))


def theory_uncoded_fer(modulation: int, payload_len: int, snr_db: float) -> float:
    """Closed-form AWGN frame-error rate for UNCODED BPSK/QPSK/QAM16/QAM64
    payloads — the waterfall-position anchor (BASELINE.md:27 contract).

    SNR here is the per-sample SNR of the sweep's noise model (noise var
    p_sig/10^(snr/10) per complex sample); with k=2 samples/symbol and a
    matched filter, Es/N0 = k * snr_lin. The payload is bit-exact iff NO
    payload symbol is in error (any symbol error flips >= 1 Gray bit and
    fails the CRC/bit-exactness check), so FER = 1 - (1 - Ps)^n_syms with
    the EXACT symbol-error rate Ps per constellation:

    - BPSK:  Ps = Q(sqrt(2 Es/N0))
    - QPSK:  Ps = 1 - (1 - Q(sqrt(Es/N0)))^2      (independent Gray I/Q)
    - square M-QAM (16/64, per-axis Gray PAM as built by ops/modem.py):
      p_axis = 2 (1 - 1/sqrt(M)) Q(sqrt(3 Es/N0 / (M-1)));
      Ps = 1 - (1 - p_axis)^2
    """
    import math

    from liquiddsp_tpu.core.config import MOD_BPS

    es_n0 = 2.0 * 10.0 ** (snr_db / 10.0)  # k = fs.K_SAMP = 2
    if modulation == 0:  # BPSK
        ps = _qfunc(math.sqrt(2.0 * es_n0))
    elif modulation == 1:  # QPSK
        ps = 1.0 - (1.0 - _qfunc(math.sqrt(es_n0))) ** 2
    elif modulation in (8, 10):  # square QAM16 / QAM64
        m_pts = 1 << MOD_BPS[modulation]
        p_axis = (
            2.0
            * (1.0 - 1.0 / math.sqrt(m_pts))
            * _qfunc(math.sqrt(3.0 * es_n0 / (m_pts - 1)))
        )
        ps = 1.0 - (1.0 - p_axis) ** 2
    else:
        raise ValueError("theory anchor covers uncoded BPSK/QPSK/QAM16/QAM64")
    n_bits = 8 * (payload_len + 3)  # payload + CRC-24
    n_syms = -(-n_bits // MOD_BPS[modulation])
    return 1.0 - (1.0 - ps) ** n_syms


# Distance spectrum of the K=7 rate-1/2 (171,133) convolutional code (V27):
# a_d = number of error events at Hamming distance d, d = 10, 12, ..., 22
# (standard published spectrum; dfree = 10).
_V27_AD = {10: 11, 12: 38, 14: 193, 16: 1331, 18: 7275, 20: 40406, 22: 234969}


def conv_event_spectrum(inner_code: int, dmax: int = 16) -> dict[int, float]:
    """Exact error-event distance spectrum {d: a_d} of the framework's OWN
    punctured (171,133) codes, computed from liquiddsp_tpu's puncture
    patterns (ops/fec/conv.py PUNCTURE_PATTERNS) by weight-truncated DP
    over the 64-state trellis — no literature table to mis-transcribe, and
    it stays correct if the framework's (framework-defined) patterns ever
    change. a_d is averaged over the puncture-period starting phases (the
    standard per-position union-bound weighting for punctured codes).
    """
    from liquiddsp_tpu.ops.fec.conv import G0, G1, NSTATES, PUNCTURE_PATTERNS

    p0, p1 = PUNCTURE_PATTERNS[inner_code]
    P = len(p0)
    # transition/output tables: register = (u << 6) | state, next state =
    # ((u << 5) | (state >> 1)); outputs = parity(G & register)
    par = lambda v: bin(v).count("1") & 1
    nxt = np.zeros((NSTATES, 2), dtype=np.int64)
    wout = np.zeros((NSTATES, 2, 2), dtype=np.int64)  # [state, u, branch]
    for s in range(NSTATES):
        for u in range(2):
            reg = (u << 6) | s
            nxt[s, u] = (u << 5) | (s >> 1)
            wout[s, u, 0] = par(G0 & reg)
            wout[s, u, 1] = par(G1 & reg)

    events = np.zeros(dmax + 1, dtype=np.float64)
    max_steps = 80 * P + 80  # weight-<=dmax events are far shorter
    for phase0 in range(P):
        # active[s, w] = number of paths currently in nonzero state s with
        # accumulated (punctured) output weight w
        active = np.zeros((NSTATES, dmax + 1), dtype=np.float64)
        w0 = wout[0, 1, 0] * p0[phase0 % P] + wout[0, 1, 1] * p1[phase0 % P]
        if w0 <= dmax:
            active[nxt[0, 1], w0] = 1.0  # the diverging branch (u=1)
        for t in range(1, max_steps):
            ph = (phase0 + t) % P
            nact = np.zeros_like(active)
            for s in range(1, NSTATES):
                row = active[s]
                if not row.any():
                    continue
                for u in range(2):
                    w = wout[s, u, 0] * p0[ph] + wout[s, u, 1] * p1[ph]
                    ns = nxt[s, u]
                    # shift-accumulate: total weight = branch weight w +
                    # accumulated path weight (row index)
                    if ns == 0:
                        if w:
                            events[w:] += row[: dmax + 1 - w]
                        else:
                            events += row
                    else:
                        if w:
                            nact[ns, w:] += row[: dmax + 1 - w]
                        else:
                            nact[ns] += row
            active = nact
            if not active.any():
                break
    total = {d: float(events[d]) / P for d in range(1, dmax + 1) if events[d] > 0}
    return total


def _pairwise_p2(d_arr, p2_unit):
    return sum(a * p2_unit(d) for d, a in d_arr.items())


def theory_conv_fer_ub(
    inner_code: int, modulation: int, l_steps: int, snr_db: float,
    dmax: int = 16,
) -> float:
    """Union upper bound on the soft-Viterbi frame-error rate for any
    (inner punctured code, modulation) row — the coded-row position anchor.

    - BPSK/QPSK (coherent PSK with 1-2 bits/sym): exact soft pairwise error
      P2(d) = Q(sqrt(2 d Ec/N0)), Ec = Es/bits_per_sym.
    - Square QAM: P2(d) <= [4 p (1-p)]^(d/2) (Bhattacharyya bound with the
      exact per-coded-bit hard error probability p of the Gray PAM
      mapping). Valid chain: soft-ML <= hard-ML <= Bhattacharyya.
    - An OUTER code can only reduce FER, so the inner bound remains a true
      (if loose) upper bound for concatenated rows; ``l_steps`` is the
      inner trellis length in information bits (the outer-encoded bit
      count, fs.FrameSpec(cfg).outer_bits).

    FER <= l_steps * sum_d a_d P2(d), with a_d the exact event spectrum of
    the framework's own puncture patterns (conv_event_spectrum).
    """
    import math

    from liquiddsp_tpu.core.config import MOD_BPS

    spectrum = conv_event_spectrum(inner_code, dmax)
    es_n0 = 2.0 * 10.0 ** (snr_db / 10.0)  # k = 2 samp/sym
    bps = MOD_BPS[modulation]
    if modulation in (0, 1):  # BPSK / QPSK: exact soft pairwise
        ec_n0 = es_n0 / bps
        p2 = lambda d: _qfunc(math.sqrt(2.0 * d * ec_n0))
    elif modulation == 5:  # DQPSK: standard ~2.3 dB differential-detection
        # penalty on the coherent-QPSK pairwise term (approximate anchor,
        # not a proven bound — labeled theory_fer_approx in the records)
        ec_n0 = es_n0 * 10.0 ** (-0.23) / 2.0
        p2 = lambda d: _qfunc(math.sqrt(2.0 * d * ec_n0))
    elif modulation in (8, 10):  # square QAM16/64: Bhattacharyya
        p = _qam_coded_bit_error(modulation, es_n0)
        z = math.sqrt(max(4.0 * p * (1.0 - p), 1e-300))
        p2 = lambda d: z**d
    else:
        raise ValueError("conv anchor covers BPSK/QPSK/DQPSK/QAM16/QAM64")
    s = sum(a * p2(d) for d, a in spectrum.items())
    return min(1.0, l_steps * s)


def _qam_coded_bit_error(modulation: int, es_n0: float) -> float:
    """Exact average per-bit hard error probability of the square-QAM Gray
    mapping at symbol SNR Es/N0 (averaged over the bit positions of one
    PAM axis; both axes are symmetric)."""
    import math

    from liquiddsp_tpu.core.config import MOD_BPS

    bps = MOD_BPS[modulation]
    m_axis = 1 << (bps // 2)  # levels per axis (4 for QAM16, 8 for QAM64)
    # unit-average-energy square QAM: axis levels +-1, +-3, ... scaled by
    # sqrt(3 / (2 (M_axis^2 - 1)))
    scale = math.sqrt(3.0 * es_n0 / (2.0 * (m_axis * m_axis - 1.0)))
    nbits = bps // 2
    # per-axis Gray bit error: standard closed form (Cho & Yoon 2002)
    total = 0.0
    for k in range(1, nbits + 1):
        pk = 0.0
        top = (1 - 2**-k) * m_axis - 1
        for i in range(int(top) + 1):
            w = math.floor(i * 2 ** (k - 1) / m_axis + 0.5)
            sgn = (-1) ** w
            c = 2 ** (k - 1) - math.floor(i * 2 ** (k - 1) / m_axis + 0.5)
            pk += sgn * c * _qfunc((2 * i + 1) * scale * math.sqrt(2.0))
        total += (2.0 / m_axis) * pk
    return total / nbits


def theory_v27_fer_ub(payload_len: int, snr_db: float) -> float:
    """Union upper bound on the soft-decision V27 frame-error rate over
    QPSK — the coded-row position anchor.

    Each QPSK symbol carries 2 coded bits at energy Es/2, so the per-coded-
    bit SNR is gamma_c = (Es/N0)/2 and the soft pairwise error at distance
    d is P2(d) = Q(sqrt(2 d gamma_c)) = Q(sqrt(d Es/N0)). A frame fails if
    any of ~L trellis steps starts an error event:
    FER <= L * sum_d a_d P2(d). A true upper bound (tight within a few x
    below FER ~ 0.1); the test asserts measured <= bound + sampling slack.
    """
    import math

    es_n0 = 2.0 * 10.0 ** (snr_db / 10.0)
    l_info = 8 * (payload_len + 3)
    s = sum(a * _qfunc(math.sqrt(d * es_n0)) for d, a in _V27_AD.items())
    return min(1.0, l_info * s)


def theory_golay_fer(payload_len: int, snr_db: float, modulation: int = 1) -> float:
    """Exact block-FER of the (24,12) extended-Golay OUTER code alone
    (inner none) over coherent BPSK/QPSK with hard decisions at the
    decoder input: the decoder corrects every <=3-bit pattern
    (ops/fec/block.py max_correct=3), so
    P_blk = P(>3 errors in 24), FER = 1 - (1 - P_blk)^n_blocks."""
    import math

    from liquiddsp_tpu.core.config import MOD_BPS

    es_n0 = 2.0 * 10.0 ** (snr_db / 10.0)
    p = _qfunc(math.sqrt(2.0 * es_n0 / MOD_BPS[modulation]))
    n_bits = 8 * (payload_len + 3)
    n_blocks = -(-n_bits // 12)
    p_ok = sum(
        math.comb(24, e) * p**e * (1 - p) ** (24 - e) for e in range(4)
    )
    return min(1.0, max(0.0, 1.0 - p_ok**n_blocks))


def theory_rs255_fer(payload_len: int, snr_db: float, modulation: int = 1) -> float:
    """Exact block-FER of the RS(255,223) OUTER code alone (inner none)
    over coherent BPSK/QPSK: t = 16 byte-symbol corrections per block
    (ops/fec/rs.py), byte error p_B = 1 - (1-p)^8."""
    import math

    from liquiddsp_tpu.core.config import MOD_BPS

    es_n0 = 2.0 * 10.0 ** (snr_db / 10.0)
    p = _qfunc(math.sqrt(2.0 * es_n0 / MOD_BPS[modulation]))
    pb = 1.0 - (1.0 - p) ** 8
    n_bytes = payload_len + 3
    n_blocks = -(-n_bytes // 223)
    p_ok = sum(
        math.comb(255, e) * pb**e * (1 - pb) ** (255 - e) for e in range(17)
    )
    return min(1.0, max(0.0, 1.0 - p_ok**n_blocks))


_PROGRAMS = {}


def _trial_program(jax, jnp, cfg, trials, payload_len, impair=None):
    """Per-config jitted trial block; SNR is a traced scalar so all SNR
    points of one config share a single compilation.

    ``impair``: extra channel impairment on top of the offset/phase/gain/
    CFO/fractional-timing randomization —
      "multipath": per-trial static 1-symbol echo, amplitude U(0.2, 0.4),
                   uniform phase (the LMMSE equalizer path);
      "sfo40":     +40 ppm TX/RX sample-clock offset applied with the
                   framework's own arbitrary polyphase resampler (a real
                   stretched waveform; the SFO tracker path).
    """
    key = (cfg, trials, payload_len, impair)
    if key in _PROGRAMS:
        return _PROGRAMS[key]

    from liquiddsp_tpu.ops import resample
    from liquiddsp_tpu.phy import framegen
    from liquiddsp_tpu.phy.framesync import framesync_fixed

    f = framegen.frame_length(cfg)
    block = BLOCK
    while f + 1024 > block:  # long-frame configs get a bigger block
        block *= 2

    import numpy as np

    @jax.jit
    def trial_block(rng_key, snr_db):
        kp, ko, kph, kg, kc, kt, kn, km = jax.random.split(rng_key, 8)
        payloads = jax.random.randint(
            kp, (trials, payload_len), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        frames = framegen.framegen(payloads, cfg)  # [N, f]
        x = jnp.pad(frames, ((0, 0), (0, block - f)))
        if impair == "sfo40":
            # TX clock 40 ppm fast relative to the RX: resample the whole
            # block; frame starts scale by 1/(1+ppm) (negligible vs the +-2
            # sample detection criterion at these offsets)
            x = resample.arbitrary(x, 1.0 / (1.0 + 40e-6), block)
        # random integer offset per trial via per-row roll (gather)
        off = jax.random.randint(ko, (trials,), 200, block - f - 200)
        idx = (jnp.arange(block)[None, :] - off[:, None]) % block
        x = jnp.take_along_axis(x, idx, axis=1)
        if impair == "multipath":
            # static per-trial 2-ray channel: echo at 1 symbol (2 samples)
            amp = jax.random.uniform(km, (trials, 1), minval=0.2, maxval=0.4)
            th = jax.random.uniform(
                jax.random.fold_in(km, 1), (trials, 1), minval=-np.pi, maxval=np.pi
            )
            echo = jnp.pad(x[:, :-2], ((0, 0), (2, 0)))
            x = x + amp * jnp.exp(1j * th) * echo
        elif impair is not None and impair.startswith("fading"):
            # Rayleigh flat fading, Jakes sum-of-sinusoids (P = 8 rays):
            # coherence time T_c = tc_frac * frame_samples, i.e. the Doppler
            # per sample is fd = 0.423 / T_c. The per-frame tracker assumes
            # h static within a frame (docs/ARCHITECTURE.md:108-141); these
            # rows measure where that assumption breaks.
            tc_frac = float(impair[len("fading"):])
            fd = 0.423 / (tc_frac * f)
            n_rays = 8
            ka = jax.random.fold_in(km, 2)
            alpha = jax.random.uniform(
                ka, (trials, n_rays), minval=0.0, maxval=2 * np.pi
            )
            psi = jax.random.uniform(
                jax.random.fold_in(ka, 1), (trials, n_rays),
                minval=0.0, maxval=2 * np.pi,
            )
            tt_f = jnp.arange(block, dtype=jnp.float32)
            arg = (
                2 * np.pi * fd * jnp.cos(alpha)[:, :, None] * tt_f[None, None, :]
                + psi[:, :, None]
            )
            h = jnp.sum(jnp.exp(1j * arg), axis=1) / np.sqrt(n_rays)
            x = x * h
        elif impair == "ramp":
            # +-30% linear amplitude ramp across the frame (static-gain
            # violation with no phase dynamics): g goes 0.7 -> 1.3 over the
            # frame's extent starting at its true offset
            tt_f = jnp.arange(block, dtype=jnp.float32)
            g = 1.0 + 0.6 * ((tt_f[None, :] - off[:, None]) / f - 0.5)
            x = x * g
        # random carrier phase, gain, CFO, fractional delay
        phase = jax.random.uniform(kph, (trials, 1), minval=-np.pi, maxval=np.pi)
        gain = jax.random.uniform(kg, (trials, 1), minval=0.5, maxval=1.5)
        cfo = jax.random.uniform(kc, (trials, 1), minval=-0.015, maxval=0.015)
        tt = jnp.arange(block, dtype=jnp.float32)
        x = x * gain * jnp.exp(1j * (cfo * tt + phase))
        frac = jax.random.uniform(kt, (trials, 1), minval=-0.5, maxval=0.5)
        freqs = jnp.fft.fftfreq(block).astype(jnp.float32)
        x = jnp.fft.ifft(jnp.fft.fft(x, axis=1) * jnp.exp(-2j * np.pi * freqs * frac), axis=1)
        p_sig = jnp.mean(jnp.abs(frames) ** 2) * gain**2
        sigma = jnp.sqrt(p_sig / (2 * 10 ** (snr_db / 10)))
        noise = sigma * (
            jax.random.normal(kn, (trials, block))
            + 1j * jax.random.normal(jax.random.fold_in(kn, 1), (trials, block))
        )
        x = (x + noise).astype(jnp.complex64)
        res = framesync_fixed(x, cfg, max_frames=2)
        # nearest candidate to the true offset
        err = jnp.abs(res.start - off[:, None])
        near = (err <= 2) & res.mask
        det = jnp.any(near, axis=1)
        hdr = jnp.any(near & res.header_valid, axis=1)
        exact = jnp.all(res.payload == payloads[:, None, :], axis=-1)
        ok = jnp.any(near & res.payload_valid & exact, axis=1)
        return (
            jnp.sum(det.astype(jnp.int32)),
            jnp.sum(hdr.astype(jnp.int32)),
            jnp.sum(ok.astype(jnp.int32)),
        )

    _PROGRAMS[key] = trial_block
    return trial_block


def run_point(jax, jnp, cfg, snr_db, trials, seed, payload_len=64, impair=None):
    """One (config, snr) point: ``trials`` single-frame blocks."""
    prog = _trial_program(jax, jnp, cfg, trials, payload_len, impair)
    det, hdr, ok = prog(jax.random.PRNGKey(seed), jnp.float32(snr_db))
    return int(det), int(hdr), int(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trials", type=int, default=256)
    ap.add_argument("--payload-len", type=int, default=64)
    ap.add_argument("--out", default="bench/FER_SWEEP.json")
    ap.add_argument("--configs", default="", help="comma-separated labels subset")
    args = ap.parse_args()

    from liquiddsp_tpu.utils.tpu_guard import guarded_backend_init

    jax = guarded_backend_init(cpu=args.cpu, canary=True)
    import jax.numpy as jnp

    from liquiddsp_tpu.core.config import FrameConfig

    subset = set(args.configs.split(",")) if args.configs else None
    records = []
    t0 = time.time()
    for mod, inner, outer, label, impair in CONFIGS:
        if subset and label not in subset:
            continue
        cfg = FrameConfig(mod, inner, outer, args.payload_len)
        for snr in SNR_GRID:
            import zlib

            det, hdr, ok = run_point(
                jax, jnp, cfg, snr, args.trials,
                # stable across processes (builtin hash is salted per run)
                seed=zlib.crc32(f"{label}:{snr}".encode()) % (1 << 31),
                impair=impair,
            )
            rec = {
                "config": label,
                "modulation": mod,
                "inner_code": inner,
                "outer_code": outer,
                "impairment": impair,
                "snr_db": snr,
                "n": args.trials,
                "det_rate": det / args.trials,
                "hdr_rate": hdr / args.trials,
                "fer": 1.0 - ok / args.trials,
                # payload-decode FER conditioned on header acquisition — the
                # quantity coded-row theory (theory_fer_ub) bounds; the
                # unconditional fer folds in detection/header outage
                "fer_given_hdr": (1.0 - ok / hdr) if hdr else None,
            }
            if inner == 0 and outer == 0 and mod in (0, 1, 8, 10) and impair is None:
                rec["theory_fer"] = theory_uncoded_fer(mod, args.payload_len, snr)
            if inner >= 1 and mod in (0, 1, 5, 8, 10) and impair is None:
                # coded-row anchor: union UB on the inner soft-Viterbi FER
                # from the framework's own exact puncture spectra; an outer
                # code only lowers FER, so the bound stays valid (loose)
                # for concatenated rows. DQPSK's differential penalty is an
                # approximation, so its column is labeled _approx.
                from liquiddsp_tpu.phy import frame_spec as _fspec

                l_steps = _fspec.FrameSpec(cfg).outer_bits
                key = "theory_fer_approx" if mod == 5 else "theory_fer_ub"
                rec[key] = theory_conv_fer_ub(inner, mod, l_steps, snr)
            records.append(rec)
            print(
                f"{label:16s} snr={snr:5.1f}  det={rec['det_rate']:.3f} "
                f"hdr={rec['hdr_rate']:.3f} fer={rec['fer']:.3f}",
                file=sys.stderr,
            )
    out = {
        "block": BLOCK,
        "payload_len": args.payload_len,
        "trials_per_point": args.trials,
        "device": str(jax.devices()[0]),
        "elapsed_s": time.time() - t0,
        "records": records,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"metric": "fer_sweep_points", "value": len(records), "out": args.out}))


if __name__ == "__main__":
    main()
