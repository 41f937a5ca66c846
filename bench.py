#!/usr/bin/env python
"""Benchmark: aggregate RX throughput (samples/s/chip) on real TPU hardware.

Measures the full framesync path (AGC-normalized detection + candidate
extraction + header decode + payload decode) over a 64-channel stream filled
with QPSK flexframes at ~20 dB SNR — BASELINE configs 1+3 rolled into the
headline metric "RX samples/s/chip".

Baseline: the north-star target is >= 1 Gsample/s aggregate on a v5e-16
(BASELINE.md), i.e. 62.5 Msample/s/chip; vs_baseline = value / 62.5e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from liquiddsp_tpu.core.config import FrameConfig  # noqa: E402
from liquiddsp_tpu.phy import framegen  # noqa: E402
from liquiddsp_tpu.phy.framesync import framesync_fixed  # noqa: E402

PER_CHIP_BASELINE = 62.5e6  # 1 Gsample/s / 16 chips (BASELINE.md)

CFG = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
BATCH = 64  # channels
BLOCK = 1 << 16  # samples per channel per step
SNR_DB = 20.0


def build_stream(rng: np.random.Generator) -> np.ndarray:
    """[BATCH, BLOCK] stream: frames at ~55% duty cycle + AWGN."""
    payloads = rng.integers(0, 256, (BATCH, CFG.payload_len), dtype=np.uint8)
    frames = np.asarray(framegen.framegen(jnp.asarray(payloads), CFG))
    f = frames.shape[1]
    x = np.zeros((BATCH, BLOCK), dtype=np.complex64)
    gap = int(0.8 * f)
    for b in range(BATCH):
        pos = int(rng.integers(0, gap))
        while pos + f <= BLOCK:
            x[b, pos : pos + f] = frames[b]
            pos += f + gap
    p_sig = np.mean(np.abs(frames) ** 2)
    sigma = np.sqrt(p_sig / (2 * 10 ** (SNR_DB / 10)))
    x += sigma * (
        rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape)
    ).astype(np.complex64)
    return x


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(build_stream(rng)), dev)
    max_frames = BLOCK // framegen.frame_length(CFG) + 2

    step = jax.jit(lambda a: framesync_fixed(a, CFG, max_frames=max_frames))
    # warmup + compile
    res = step(x)
    jax.block_until_ready(res.payload_valid)
    n_ok = int(np.asarray(jnp.sum(res.payload_valid)))
    assert n_ok > 0, "bench stream produced no decoded frames"

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        res = step(x)
    jax.block_until_ready(res.payload_valid)
    dt = time.perf_counter() - t0

    samples = BATCH * BLOCK * iters
    rate = samples / dt
    frames_per_s = n_ok * iters / dt
    print(
        json.dumps(
            {
                "metric": "rx_samples_per_sec_per_chip",
                "value": rate,
                "unit": "samples/s",
                "vs_baseline": rate / PER_CHIP_BASELINE,
                "extra": {
                    "frames_per_sec": frames_per_s,
                    "decoded_frames_per_block": n_ok,
                    "snr_db": SNR_DB,
                    "device": str(dev),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
