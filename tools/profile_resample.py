#!/usr/bin/env python
"""Time ops/resample.arbitrary at the bench shape (64x65536, ppm rates)."""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")

B, L = 64, 1 << 16
ITERS = 40


def _sync(r):
    import jax

    leaf = [l for l in jax.tree.leaves(r) if hasattr(l, "dtype")][0]
    return float(np.asarray(leaf.sum(), dtype=np.float64))


def timeit(fn, *a, n=ITERS):
    _sync(fn(*a))
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

    from liquiddsp_tpu.ops import resample

    @jax.jit
    def synth(key):
        a = jax.random.normal(key, (B, L))
        b = jax.random.normal(jax.random.fold_in(key, 1), (B, L))
        return (a + 1j * b).astype(jnp.complex64)

    x = synth(jax.random.PRNGKey(0))
    _sync(jnp.abs(x))

    floor = timeit(jax.jit(lambda a: jnp.real(a[..., :8]) + 1.0), x)
    print(f"floor            {floor*1e3:7.3f} ms")

    for name, rate in [
        ("50ppm", 1.0 + 50e-6),
        ("-50ppm", 1.0 - 50e-6),
        ("5ppm", 1.0 + 5e-6),
        ("500ppm(gather)", 1.0 + 500e-6),
    ]:
        fn = jax.jit(
            lambda a, r=rate: jnp.abs(resample.arbitrary(a, r, L)).sum()
        )
        t = timeit(fn, x)
        print(
            f"{name:16s} {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:7.3f})  "
            f"{B*L/max(t-floor,1e-9)/1e9:6.2f} G"
        )

    # the bench's 4-group program: per-group convs vs one shared conv
    ppms = (-50.0, -20.0, 20.0, 50.0)
    g = B // len(ppms)
    rates = tuple(1.0 + p * 1e-6 for p in ppms)

    def groups(a):
        parts = [
            resample.arbitrary(a[i * g : (i + 1) * g], r, L)
            for i, r in enumerate(rates)
        ]
        return jnp.abs(jnp.concatenate(parts, axis=0)).sum()

    t = timeit(jax.jit(groups), x)
    print(f"{'4-group percall':16s} {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:7.3f})")

    def grouped(a):
        return jnp.abs(resample.arbitrary_groups(a, rates, L)).sum()

    t = timeit(jax.jit(grouped), x)
    print(f"{'4-group shared':16s} {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:7.3f})")

    def grouped_bf16(a):
        return jnp.abs(
            resample.arbitrary_groups(a, rates, L, compute_dtype=jnp.bfloat16)
        ).sum()

    t = timeit(jax.jit(grouped_bf16), x)
    print(f"{'4-group bf16':16s} {t*1e3:7.3f} ms  (-floor {(t-floor)*1e3:7.3f})")


if __name__ == "__main__":
    main()
