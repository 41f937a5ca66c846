"""Byte <-> bit packing helpers (MSB-first), batched."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bytes_to_bits(b: jax.Array) -> jax.Array:
    """uint8 [..., L] -> int8 bits [..., 8L], MSB first."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (b[..., None] >> shifts) & 1
    return bits.reshape(b.shape[:-1] + (b.shape[-1] * 8,)).astype(jnp.int8)


def bits_to_bytes(bits: jax.Array) -> jax.Array:
    """int bits [..., 8L] -> uint8 [..., L], MSB first."""
    shape = bits.shape[:-1] + (bits.shape[-1] // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.int32)
    v = jnp.sum(bits.reshape(shape).astype(jnp.int32) * weights, axis=-1)
    return v.astype(jnp.uint8)


def bytes_to_bits_host(b: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.asarray(b, dtype=np.uint8), axis=-1)


def bits_to_bytes_host(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, dtype=np.uint8), axis=-1)
