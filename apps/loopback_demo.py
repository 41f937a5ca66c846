#!/usr/bin/env python
"""Loopback demo: flex_tx -> AWGN channel -> flex_rx, printing link metrics.

The reference's apps/ directory is an empty scaffold (SURVEY.md section 1);
this is the working equivalent: a CLI that runs the QPSK loopback of
BASELINE config 1 at a chosen SNR and reports recovery statistics.

    python apps/loopback_demo.py --snr 15 --packets 20 --mod 1
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mod", type=int, default=1, help="modulation index 0-10")
    ap.add_argument("--inner", type=int, default=0, help="inner FEC index 0-6")
    ap.add_argument("--outer", type=int, default=0, help="outer FEC index 0-7")
    ap.add_argument("--snr", type=float, default=20.0, help="SNR in dB")
    ap.add_argument("--cfo", type=float, default=0.0, help="CFO rad/sample")
    ap.add_argument("--packets", type=int, default=10)
    ap.add_argument("--payload-len", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from liquiddsp_tpu.core.config import FrameConfig
    from liquiddsp_tpu.phy import framegen
    from liquiddsp_tpu.runtime.blocks import FlexRx
    from liquiddsp_tpu.utils.metrics import MetricsCollector

    cfg = FrameConfig(args.mod, args.inner, args.outer, args.payload_len)
    rng = np.random.default_rng(args.seed)
    rx = FlexRx(max_payload_len=args.payload_len)
    collector = MetricsCollector()

    n_ok = 0
    for pkt in range(args.packets):
        payload = rng.integers(0, 256, (1, args.payload_len), dtype=np.uint8)
        frame = np.asarray(framegen.framegen(jnp.asarray(payload), cfg))
        t = frame.shape[1] + 2048
        x = np.zeros((1, t), dtype=np.complex64)
        off = int(rng.integers(100, 1000))
        x[0, off : off + frame.shape[1]] = frame
        x *= np.exp(1j * args.cfo * np.arange(t))[None, :]
        p_sig = np.mean(np.abs(frame) ** 2)
        sigma = np.sqrt(p_sig / (2 * 10 ** (args.snr / 10)))
        x = (x + sigma * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))).astype(np.complex64)
        infos = rx.work(x)
        collector.samples += t
        for info in infos:
            collector.count_packet(
                info["modulation"], info["inner_code"], info["outer_code"],
                bool(info["payload_valid"]),
            )
            if info["payload_valid"] and np.array_equal(
                np.asarray(info["payload"]), payload[0]
            ):
                n_ok += 1

    print(f"packets sent: {args.packets}")
    print(f"payloads recovered bit-exactly: {n_ok}")
    print(f"config counters (received/correct): "
          f"{int(collector.num_received.sum())}/{int(collector.num_correct.sum())}")
    rep = collector.report()
    print(f"processed {rep['samples']} samples in {rep['elapsed_s']:.2f}s "
          f"({rep['samples_per_sec']:.0f} samp/s host-loop rate)")


if __name__ == "__main__":
    main()
