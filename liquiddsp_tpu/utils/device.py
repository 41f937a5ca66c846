"""Device-transfer helpers for the tunneled axon TPU backend.

Measured quirks (CLAUDE.md): eager (outside-jit) device complex arithmetic
returns poisoned arrays; complex64 DEVICE->HOST transfers are
UNIMPLEMENTED; and — measured round 4 — complex64 HOST->DEVICE puts are
UNIMPLEMENTED as well (at every size probed, 1k..2M elements). The working
path is float32 real/imag puts followed by an in-jit combine, which these
helpers encapsulate so runtime code never issues a raw complex put.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_combine = jax.jit(lambda a, b: (a + 1j * b).astype(jnp.complex64))
_shape2d = jax.jit(lambda a: jnp.atleast_2d(a).astype(jnp.complex64))


def put_c64(x: np.ndarray) -> jax.Array:
    """Host complex array -> device complex64, via split f32 puts."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        xr = np.ascontiguousarray(x, dtype=np.float32)
        return _combine(jnp.asarray(xr), jnp.asarray(np.zeros_like(xr)))
    return _combine(
        jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32)),
        jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32)),
    )


def as_c64_2d(x) -> jax.Array:
    """Any input -> [B, T] complex64 device array, avoiding both eager
    device complex ops and raw complex host->device puts."""
    if isinstance(x, jax.Array):
        if x.ndim == 2 and x.dtype == jnp.complex64:
            return x
        return _shape2d(x)
    return put_c64(np.atleast_2d(np.asarray(x)))
