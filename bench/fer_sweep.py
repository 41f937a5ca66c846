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
import sys
import time

sys.path.insert(0, ".")

import numpy as np


# (modulation, inner, outer, label) — spans the modem family and the FEC
# families (conv + punctured, Golay, RS, Hamming) per VERDICT r1 item 3
CONFIGS = [
    (0, 0, 0, "bpsk"),
    (1, 0, 0, "qpsk"),
    (1, 1, 1, "qpsk_v27_golay"),
    (1, 6, 0, "qpsk_p78"),
    (5, 1, 0, "dqpsk_v27"),
    (8, 1, 2, "qam16_v27_rs"),
    (10, 0, 0, "qam64"),
    (10, 2, 3, "qam64_p23_h74"),
]

SNR_GRID = [0.0, 2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 20.0, 25.0, 30.0]
BLOCK = 4096


_PROGRAMS = {}


def _trial_program(jax, jnp, cfg, trials, payload_len):
    """Per-config jitted trial block; SNR is a traced scalar so all SNR
    points of one config share a single compilation."""
    key = (cfg, trials, payload_len)
    if key in _PROGRAMS:
        return _PROGRAMS[key]

    from liquiddsp_tpu.phy import framegen
    from liquiddsp_tpu.phy.framesync import framesync_fixed

    f = framegen.frame_length(cfg)
    assert f + 512 <= BLOCK, f"frame too long for block: {f}"

    import numpy as np

    @jax.jit
    def trial_block(rng_key, snr_db):
        kp, ko, kph, kg, kc, kt, kn = jax.random.split(rng_key, 7)
        payloads = jax.random.randint(
            kp, (trials, payload_len), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        frames = framegen.framegen(payloads, cfg)  # [N, f]
        x = jnp.pad(frames, ((0, 0), (0, BLOCK - f)))
        # random integer offset per trial via per-row roll (gather)
        off = jax.random.randint(ko, (trials,), 200, BLOCK - f - 200)
        idx = (jnp.arange(BLOCK)[None, :] - off[:, None]) % BLOCK
        x = jnp.take_along_axis(x, idx, axis=1)
        # random carrier phase, gain, CFO, fractional delay
        phase = jax.random.uniform(kph, (trials, 1), minval=-np.pi, maxval=np.pi)
        gain = jax.random.uniform(kg, (trials, 1), minval=0.5, maxval=1.5)
        cfo = jax.random.uniform(kc, (trials, 1), minval=-0.015, maxval=0.015)
        tt = jnp.arange(BLOCK, dtype=jnp.float32)
        x = x * gain * jnp.exp(1j * (cfo * tt + phase))
        frac = jax.random.uniform(kt, (trials, 1), minval=-0.5, maxval=0.5)
        freqs = jnp.fft.fftfreq(BLOCK).astype(jnp.float32)
        x = jnp.fft.ifft(jnp.fft.fft(x, axis=1) * jnp.exp(-2j * np.pi * freqs * frac), axis=1)
        p_sig = jnp.mean(jnp.abs(frames) ** 2) * gain**2
        sigma = jnp.sqrt(p_sig / (2 * 10 ** (snr_db / 10)))
        noise = sigma * (
            jax.random.normal(kn, (trials, BLOCK))
            + 1j * jax.random.normal(jax.random.fold_in(kn, 1), (trials, BLOCK))
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


def run_point(jax, jnp, cfg, snr_db, trials, seed, payload_len=64):
    """One (config, snr) point: ``trials`` single-frame blocks."""
    prog = _trial_program(jax, jnp, cfg, trials, payload_len)
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

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from liquiddsp_tpu.core.config import FrameConfig

    subset = set(args.configs.split(",")) if args.configs else None
    records = []
    t0 = time.time()
    for mod, inner, outer, label in CONFIGS:
        if subset and label not in subset:
            continue
        cfg = FrameConfig(mod, inner, outer, args.payload_len)
        for snr in SNR_GRID:
            det, hdr, ok = run_point(
                jax, jnp, cfg, snr, args.trials, seed=hash((label, snr)) % (1 << 31)
            )
            rec = {
                "config": label,
                "modulation": mod,
                "inner_code": inner,
                "outer_code": outer,
                "snr_db": snr,
                "n": args.trials,
                "det_rate": det / args.trials,
                "hdr_rate": hdr / args.trials,
                "fer": 1.0 - ok / args.trials,
            }
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
