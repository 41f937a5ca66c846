#!/usr/bin/env python
"""Sub-stage timing of decode_header_full at the stacked [B, K, 3, 180]
shape (the EQ branch's 0.9 ms term, bench/EQ_ABLATION.json)."""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

B, K, W, NSYM = 64, 37, 3, 180
ITERS = 40


def _sync(r):
    """Blocking scalar fetch — the only reliable completion barrier on the
    tunneled backend (block_until_ready can return early, CLAUDE.md)."""
    import jax

    leaf = [l for l in jax.tree.leaves(r) if hasattr(l, "dtype")][0]
    return float(np.asarray(leaf.sum(), dtype=np.float64))


def timeit(fn, *a, n=ITERS):
    _sync(fn(*a))  # compile + drain any queued upstream work
    _sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n


def main():
    up = threading.Event()

    def _watchdog():
        if not up.wait(90):
            print("watchdog", file=sys.stderr)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    jax.devices()
    up.set()

    from liquiddsp_tpu.ops import modem, crc, bits as bitops
    from liquiddsp_tpu.ops.fec.block import golay2412
    from liquiddsp_tpu.phy import frame_spec as fs
    from liquiddsp_tpu.phy.framesync import decode_header_full

    g = golay2412()

    @jax.jit
    def synth(key):
        i = jax.random.randint(key, (B, K, W, NSYM), 0, 4)
        return modem.modulate(i, fs.HEADER_MOD)

    syms = synth(jax.random.PRNGKey(0))
    jax.block_until_ready(syms)

    tiny = jnp.zeros((8,), jnp.float32)
    floor = timeit(jax.jit(lambda a: a + 1.0), tiny)
    print(f"floor          {floor*1e3:7.3f} ms")

    full = jax.jit(lambda s: decode_header_full(s)[0][0].sum())
    t = timeit(full, syms)
    print(f"full w3        {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")
    full1 = jax.jit(lambda s: decode_header_full(s[..., 0, :])[0][0].sum())
    t = timeit(full1, syms)
    print(f"full w1        {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")

    demod = jax.jit(lambda s: modem.demod_hard(s, fs.HEADER_MOD).sum())
    t = timeit(demod, syms)
    print(f"demod_hard     {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")

    idx = jax.jit(lambda s: modem.demod_hard(s, fs.HEADER_MOD))(syms)
    jax.block_until_ready(idx)
    i2b = jax.jit(lambda i: modem.indices_to_bits(i, 2).sum())
    t = timeit(i2b, idx)
    print(f"indices_to_bits{t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")

    coded = jax.jit(lambda i: modem.indices_to_bits(i, 2))(idx)
    jax.block_until_ready(coded)
    dec = jax.jit(lambda c: g.decode(c).sum())
    t = timeit(dec, coded)
    print(f"golay decode   {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")

    bits = jax.jit(lambda c: g.decode(c)[..., : fs.HEADER_BITS])(coded)
    jax.block_until_ready(bits)
    b2B = jax.jit(lambda b: bitops.bits_to_bytes(b).sum())
    t = timeit(b2B, bits)
    print(f"bits_to_bytes  {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")

    hdr = jax.jit(lambda b: bitops.bits_to_bytes(b))(bits)
    jax.block_until_ready(hdr)
    chk = jax.jit(lambda h: crc.crc24_check(h).sum())
    t = timeit(chk, hdr)
    print(f"crc24_check    {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:6.3f})")


if __name__ == "__main__":
    main()
