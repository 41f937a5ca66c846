#!/usr/bin/env python
"""Stage-level TPU profiling of the RX path on bench shapes.

Times each stage of the framesync pipeline separately so optimization
effort goes where the milliseconds are. One TPU process at a time
(CLAUDE.md); run under timeout with retries.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

BATCH = 64
BLOCK = 1 << 16
SNR_DB = 20.0
ITERS = 30  # large enough to amortize the ~25 ms final scalar-fetch RPC


def _sync(r):
    """Force real completion: block_until_ready on the tunneled axon backend
    can return before compute finishes — fetch a scalar instead (float/int
    only; complex transfers are UNIMPLEMENTED on this backend)."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree.leaves(r) if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves[:1]:
        if jnp.iscomplexobj(l):
            acc += float(jnp.abs(l).sum())
        else:
            acc += float(l.sum())
    return acc


def timeit(fn, *args, n=ITERS):
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


def main():
    import threading
    import os

    up = threading.Event()

    def _watchdog():
        if not up.wait(60):
            print("backend init watchdog fired", file=sys.stderr)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    jax.devices()
    up.set()

    from liquiddsp_tpu.core.config import FrameConfig
    from liquiddsp_tpu.phy import framegen
    from liquiddsp_tpu.phy import detector as D
    from liquiddsp_tpu.phy.framesync import framesync_fixed, extract_symbols, sync_common
    from liquiddsp_tpu.kernels import correlator as C

    cfg = FrameConfig(modulation=1, inner_code=0, outer_code=0, payload_len=64)
    f = framegen.frame_length(cfg)
    gap = int(0.8 * f)
    period = 37 + f + gap
    max_frames = BLOCK // period + 2

    key = jax.random.PRNGKey(0)

    @jax.jit
    def synth(key):
        kp, kn = jax.random.split(key)
        payloads = jax.random.randint(kp, (BATCH, cfg.payload_len), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
        frames = framegen.framegen(payloads, cfg)
        pattern = jnp.concatenate(
            [jnp.zeros((BATCH, 37), jnp.complex64), frames, jnp.zeros((BATCH, gap), jnp.complex64)], axis=1)
        reps = -(-BLOCK // pattern.shape[1])
        x = jnp.tile(pattern, (1, reps))[:, :BLOCK]
        p_sig = jnp.mean(jnp.abs(frames) ** 2)
        sigma = jnp.sqrt(p_sig / (2 * 10 ** (SNR_DB / 10)))
        noise = sigma * (jax.random.normal(kn, (BATCH, BLOCK)) + 1j * jax.random.normal(jax.random.fold_in(kn, 1), (BATCH, BLOCK)))
        return (x + noise).astype(jnp.complex64)

    x = synth(key)
    jax.block_until_ready(x)
    n_samp = BATCH * BLOCK
    tm = D.templates_time()

    results = {}

    # dispatch/fetch floor: a trivial jit on a tiny array — everything below
    # carries roughly this much non-compute overhead per measurement
    tiny = jnp.zeros((8,), jnp.float32)
    null_fn = jax.jit(lambda a: a + 1.0)
    dt = timeit(null_fn, tiny)
    results["null_dispatch"] = dt
    print(f"{'null dispatch floor':24s} {dt*1e3:8.2f} ms")

    for name, fn in [
        ("corr_pallas", jax.jit(lambda a: jax.tree.map(lambda v: v, C.correlate_reduced_pallas(a, tm)))),
        ("corr_mm", jax.jit(lambda a: jax.tree.map(lambda v: v, C.correlate_reduced_mm(a, tm)))),
        ("corr_fft", jax.jit(lambda a: jax.tree.map(lambda v: v, C.correlate_reduced_xla(a, tm)))),
    ]:
        try:
            dt = timeit(fn, x)
            results[name] = dt
            print(f"{name:24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # detect only
    det_fn = jax.jit(lambda a: jax.tree.map(lambda v: v, D.detect(a, max_frames)))
    dt = timeit(det_fn, x)
    results["detect"] = dt
    print(f"{'detect(mm)':24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s")
    det = det_fn(x)

    # detect sub-stages: correlate-reduce, then peak-find/estimates
    red_fn = jax.jit(lambda a: C.correlate_reduced_mm(a, tm)["rho2"])
    dt = timeit(red_fn, x)
    print(f"{'  corr-reduce(mm)':24s} {dt*1e3:8.2f} ms")

    # extract symbols
    from liquiddsp_tpu.phy import frame_spec as fs
    spec = fs.FrameSpec(cfg)
    ext_fn = jax.jit(lambda a, d: extract_symbols(a, d, spec.frame_syms))
    dt = timeit(ext_fn, x, det)
    results["extract_symbols"] = dt
    print(f"{'extract_symbols':24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s")

    # extract_symbols sub-stages: window DMA / derotate / polyphase MF
    from liquiddsp_tpu.kernels.extract import extract_windows
    from liquiddsp_tpu.phy.framesync import _derotate_window, symbols_from_windows

    n_win = fs.K_SAMP * spec.frame_syms + fs.PULSE_TAIL
    win_fn = jax.jit(lambda a, d: extract_windows(a, d.start, n_win))
    dt = timeit(win_fn, x, det)
    results["extract_windows"] = dt
    print(f"{'  extract_windows':24s} {dt*1e3:8.2f} ms")
    win = win_fn(x, det)
    jax.block_until_ready(win)
    der_fn = jax.jit(lambda w, d: _derotate_window(w, d))
    dt = timeit(der_fn, win, det)
    results["derotate_window"] = dt
    print(f"{'  derotate_window':24s} {dt*1e3:8.2f} ms")
    sfw_fn = jax.jit(lambda w, d: symbols_from_windows(w, d, spec.frame_syms))
    dt = timeit(sfw_fn, win, det)
    results["symbols_from_windows"] = dt
    print(f"{'  syms_from_windows':24s} {dt*1e3:8.2f} ms (incl. derotate)")

    # fused Pallas recovery (extract planes -> derotate+MF kernel)
    try:
        from liquiddsp_tpu.kernels.recover import recover_symbols_planes
        from liquiddsp_tpu.phy.framesync import _candidate_taps30

        fused_fn = jax.jit(
            lambda a, d: recover_symbols_planes(
                *extract_windows(a, d.start, n_win, return_planes=True),
                d.dphi, d.phi, d.gamma, _candidate_taps30(d, True),
                spec.frame_syms,
            )
        )
        dt = timeit(fused_fn, x, det)
        results["recover_fused"] = dt
        print(f"{'  recover_fused':24s} {dt*1e3:8.2f} ms (extract+derot+MF)")
    except Exception as e:  # noqa: BLE001
        print(f"{'  recover_fused':24s} FAILED: {str(e)[:120]}")

    # full framesync
    full = jax.jit(lambda a: framesync_fixed(a, cfg, max_frames=max_frames).payload_valid.sum())
    dt = timeit(full, x)
    nv = int(full(x))
    results["framesync_fixed"] = dt
    print(f"{'framesync_fixed':24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s   valid={nv}")

    # full framesync again (stability check)
    dt = timeit(full, x)
    results["framesync_fixed_2"] = dt
    print(f"{'framesync_fixed(2)':24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s")

    # framesync without the equalizer (EQ train+apply cost)
    noeq = jax.jit(lambda a: framesync_fixed(a, cfg, max_frames=max_frames, equalize=False).payload_valid.sum())
    dt = timeit(noeq, x)
    nv = int(noeq(x))
    results["framesync_noeq"] = dt
    print(f"{'framesync(noeq)':24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s   valid={nv}")

    # framesync without refine / timing bank (lighter variants)
    lite = jax.jit(lambda a: framesync_fixed(a, cfg, max_frames=max_frames, refine=False, timing_bank=False).payload_valid.sum())
    dt = timeit(lite, x)
    nv = int(lite(x))
    results["framesync_lite"] = dt
    print(f"{'framesync(lite)':24s} {dt*1e3:8.2f} ms  -> {n_samp/dt/1e6:8.1f} Msamp/s   valid={nv}")

    # --- payload-path sub-stages on realistic shapes -----------------------
    from liquiddsp_tpu.ops import modem, crc, bits as bitops
    from liquiddsp_tpu.ops.fec.block import golay2412
    from liquiddsp_tpu.phy.framesync import decode_header, decode_payload_symbols, _refine_carrier

    syms = ext_fn(x, det)
    jax.block_until_ready(syms)
    h0, h1 = fs.PREAMBLE_SYMS, fs.PREAMBLE_SYMS + fs.HEADER_SYMS

    hdr_fn = jax.jit(lambda s: decode_header(s[..., h0:h1]))
    dt = timeit(hdr_fn, syms)
    results["decode_header"] = dt
    print(f"{'decode_header':24s} {dt*1e3:8.2f} ms")

    ref_fn = jax.jit(_refine_carrier)
    dt = timeit(ref_fn, syms)
    print(f"{'refine_carrier':24s} {dt*1e3:8.2f} ms")

    pay_fn = jax.jit(lambda s: decode_payload_symbols(s, cfg))
    dt = timeit(pay_fn, syms)
    results["decode_payload"] = dt
    print(f"{'decode_payload':24s} {dt*1e3:8.2f} ms")

    # EQ stage split (the full-vs-noeq gap): train on preamble, train on
    # preamble+header, apply over the whole frame
    from liquiddsp_tpu.phy.framesync import _eq_train, _eq_apply, EQ_TAPS
    from liquiddsp_tpu.ops import msequence as mseq

    # numpy (not eager-jnp) constants: eager complex arrays are poisoned on
    # the axon backend and crash constant embedding (CLAUDE.md)
    pre_ref = np.asarray(mseq.preamble_symbols())
    tr1_fn = jax.jit(lambda s: _eq_train(s, jnp.asarray(pre_ref)))
    dt = timeit(tr1_fn, syms)
    results["eq_train_preamble"] = dt
    print(f"{'eq_train(preamble)':24s} {dt*1e3:8.2f} ms")
    w1 = tr1_fn(syms)
    jax.block_until_ready(w1)
    refs244_np = np.concatenate([pre_ref, np.zeros(180, np.complex64)])
    tr2_fn = jax.jit(
        lambda s: _eq_train(
            s, jnp.broadcast_to(jnp.asarray(refs244_np), s.shape[:-1] + (244,))
        )
    )
    dt = timeit(tr2_fn, syms)
    results["eq_train_244"] = dt
    print(f"{'eq_train(pre+hdr)':24s} {dt*1e3:8.2f} ms")
    ap_fn = jax.jit(lambda w, s: _eq_apply(w, s))
    dt = timeit(ap_fn, w1, syms)
    results["eq_apply_full"] = dt
    print(f"{'eq_apply(full)':24s} {dt*1e3:8.2f} ms")

    msg = jnp.zeros((BATCH, max_frames, 67), jnp.uint8)
    crc_fn = jax.jit(lambda m: crc.crc24_check(m))
    dt = timeit(crc_fn, msg)
    print(f"{'crc24 [B,K,67]':24s} {dt*1e3:8.2f} ms")

    coded = jnp.zeros((BATCH, max_frames, 360), jnp.int8)
    gol_fn = jax.jit(lambda c: golay2412().decode(c))
    dt = timeit(gol_fn, coded)
    print(f"{'golay decode [B,K,360]':24s} {dt*1e3:8.2f} ms")

    # JSON artifact (bench/PROFILE.json): per-stage seconds + derived
    # throughput with the dispatch floor subtracted out
    if "--json" in sys.argv:
        import json

        floor = results.get("null_dispatch", 0.0)
        best_full = min(
            results.get("framesync_fixed", 1e9), results.get("framesync_fixed_2", 1e9)
        )
        out = {
            "batch": BATCH,
            "block": BLOCK,
            "snr_db": SNR_DB,
            "iters": ITERS,
            "stage_seconds": results,
            "dispatch_floor_s": floor,
            "compute_samples_per_sec_per_chip": n_samp / max(best_full - floor, 1e-9),
            "device": str(jax.devices()[0]),
        }
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
