"""Guarded TPU backend initialization for CLI tools.

The tunneled axon backend's failure modes (CLAUDE.md): init hangs forever
inside uninterruptible C++, or comes up HALF-BROKEN where the first
compile/execute hangs. Both need a watchdog thread + ``os._exit(3)`` so an
outer retry loop can respawn the process — and the init watchdog MUST be
disarmed immediately after ``jax.devices()`` returns, or it kills healthy
runs whose warmup outlasts the timer (this exact mis-ordering burned ~40
minutes of round 3). That dance was hand-rolled in three bench tools; this
is the single shared implementation.

Usage (before importing anything heavy):

    from liquiddsp_tpu.utils.tpu_guard import guarded_backend_init
    jax = guarded_backend_init(cpu=args.cpu)          # init watchdog only
    jax = guarded_backend_init(canary=True)           # + half-broken check

Exit code 3 = "backend init/canary hung, retry me" by convention of every
outer loop in this repo (bench.py, bench/*.py).
"""

from __future__ import annotations

import os
import sys
import threading


def guarded_backend_init(
    cpu: bool = False,
    init_timeout_s: float = 120.0,
    canary: bool = False,
    canary_timeout_s: float = 180.0,
):
    """Initialize the JAX backend under a hang watchdog; returns the jax
    module. ``cpu=True`` forces the CPU backend (no watchdog needed but the
    call order — config update BEFORE backend init — is preserved)."""
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        return jax

    up = threading.Event()

    def _init_watchdog():
        if not up.wait(init_timeout_s):
            print("backend init watchdog fired — exiting for retry",
                  file=sys.stderr)
            os._exit(3)

    threading.Thread(target=_init_watchdog, daemon=True).start()
    import jax

    jax.devices()
    up.set()  # disarm IMMEDIATELY — see module docstring

    if canary:
        # init can succeed into a half-broken session where the first
        # compile/execute hangs forever; give a tiny jit a deadline
        import jax.numpy as jnp

        done = threading.Event()

        def _canary_watchdog():
            if not done.wait(canary_timeout_s):
                print("canary watchdog fired — exiting for retry",
                      file=sys.stderr)
                os._exit(3)

        threading.Thread(target=_canary_watchdog, daemon=True).start()
        assert float(jax.jit(lambda a: (a * 2).sum())(jnp.arange(8.0))) == 56.0
        done.set()
    return jax
