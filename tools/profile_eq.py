#!/usr/bin/env python
"""Fused-diff attribution of the EQ-branch cost inside framesync_fixed.

Standalone stage timings on the tunneled backend only measure the ~1.4 ms
dispatch floor (CLAUDE.md); the trustworthy method is to time the FULL
fused framesync program with exactly one sub-stage ablated and diff
against the full program. ``sync_common(ablate=...)`` tokens:

  trk   — drop the tracked-header branch's _dd_phase_track chain
  fit2  — share one carrier fit between the eq and raw branches
  eq2   — drop the 244-symbol EQ2 retrain (keep preamble-only w1)
  apply — drop the final full-frame _eq_apply
  hdr1  — decode one header region instead of the stacked three

Run: timeout 600 python tools/profile_eq.py   (one TPU process at a time)
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

BATCH = 64
BLOCK = 1 << 16
SNR_DB = 20.0
ITERS = 40


def _sync(r):
    return float(r.sum())


def timeit(fn, x, n=ITERS):
    r = fn(x)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(x)
    _sync(r)
    return (time.perf_counter() - t0) / n


def main():
    up = threading.Event()

    def _watchdog():
        if not up.wait(90):
            print("backend init watchdog fired", file=sys.stderr)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    jax.devices()
    up.set()

    from liquiddsp_tpu.core.config import FrameConfig
    from liquiddsp_tpu.phy import framegen
    from liquiddsp_tpu.phy.framesync import framesync_fixed

    cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
    f = framegen.frame_length(cfg)
    gap = int(0.8 * f)
    period = 37 + f + gap
    max_frames = BLOCK // period + 2

    @jax.jit
    def synth(key):
        kp, kn = jax.random.split(key)
        payloads = jax.random.randint(
            kp, (BATCH, cfg.payload_len), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        frames = framegen.framegen(payloads, cfg)
        pattern = jnp.concatenate(
            [jnp.zeros((BATCH, 37), jnp.complex64), frames,
             jnp.zeros((BATCH, gap), jnp.complex64)], axis=1)
        reps = -(-BLOCK // pattern.shape[1])
        x = jnp.tile(pattern, (1, reps))[:, :BLOCK]
        p_sig = jnp.mean(jnp.abs(frames) ** 2)
        sigma = jnp.sqrt(p_sig / (2 * 10 ** (SNR_DB / 10)))
        noise = sigma * (
            jax.random.normal(kn, (BATCH, BLOCK))
            + 1j * jax.random.normal(jax.random.fold_in(kn, 1), (BATCH, BLOCK))
        )
        return (x + noise).astype(jnp.complex64)

    x = synth(jax.random.PRNGKey(0))
    jax.block_until_ready(x)
    n_samp = BATCH * BLOCK

    def variant(**kw):
        return jax.jit(
            lambda a: framesync_fixed(
                a, cfg, max_frames=max_frames, **kw
            ).payload_valid.sum()
        )

    results = {}
    t_full = timeit(variant(), x)
    results["full"] = t_full
    print(f"{'full':14s} {t_full*1e3:7.2f} ms  {n_samp/t_full/1e9:5.2f} G")

    for name, kw in [
        ("trk", {"ablate": ("trk",)}),
        ("fit2", {"ablate": ("fit2",)}),
        ("eq2", {"ablate": ("eq2",)}),
        ("apply", {"ablate": ("apply",)}),
        ("hdr1", {"ablate": ("hdr1",)}),
        ("paytrack", {"track": False}),
        ("noeq", {"equalize": False}),
        ("noeq_notrack", {"equalize": False, "track": False}),
        ("all_abl", {"ablate": ("trk", "fit2", "eq2", "apply", "hdr1")}),
    ]:
        t = timeit(variant(**kw), x)
        results[name] = t
        print(
            f"{name:14s} {t*1e3:7.2f} ms  {n_samp/t/1e9:5.2f} G   "
            f"saves {(t_full-t)*1e3:6.2f} ms"
        )

    out = {
        "batch": BATCH, "block": BLOCK, "iters": ITERS,
        "seconds_per_block": results,
        "saves_ms": {k: (t_full - v) * 1e3 for k, v in results.items()},
        "device": str(jax.devices()[0].device_kind),
    }
    with open("bench/EQ_ABLATION.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
