"""FEC dispatch over the reference's inner/outer index spaces.

Outer index 0-7 -> {NONE, GOLAY2412, RS_M8, HAMMING74, HAMMING128,
SECDED2216, SECDED3932, SECDED7264} (lib/flex_tx_impl.cc:150-181).
Inner index 0-6 -> {NONE, V27, V27P23, V27P45, V27P56, V27P67, V27P78}
(lib/flex_tx_impl.cc:119-147).

Pipeline position (phy/framegen, phy/framesync): payload bytes + CRC24 ->
**outer** encode (bytes -> bits) -> **inner** encode (bits -> bits) ->
modulate. The codec index arguments are static Python ints: each of the 616
configurations compiles its own XLA path (SURVEY.md section 7.1 "precompiled
branch tables", avoiding recompiles in the adaptation loop via caching).

Bit-level block codes pad the message bits with zeros to a whole number of
blocks; the pad is dropped on decode using the static message byte length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from liquiddsp_tpu.ops import bits as bitops
from liquiddsp_tpu.ops.fec import block, conv, rs


def _block_code(outer_code: int) -> block.LinearBlockCode:
    return {
        1: block.golay2412(),
        3: block.hamming74(),
        4: block.hamming128(),
        5: block.secded2216(),
        6: block.secded3932(),
        7: block.secded7264(),
    }[outer_code]


def outer_encoded_bits(msg_len: int, outer_code: int) -> int:
    """Number of bits after outer-encoding ``msg_len`` bytes."""
    nbits = 8 * msg_len
    if outer_code == 0:
        return nbits
    if outer_code == 2:
        return 8 * rs.encoded_len(msg_len)
    c = _block_code(outer_code)
    nblocks = -(-nbits // c.k)
    return nblocks * c.n


def outer_encode(msg_bytes: jax.Array, outer_code: int) -> jax.Array:
    """uint8 [..., L] -> coded bits int8 [..., outer_encoded_bits(L)]."""
    if outer_code == 2:
        return bitops.bytes_to_bits(rs.encode(msg_bytes))
    bits = bitops.bytes_to_bits(msg_bytes)
    if outer_code == 0:
        return bits
    c = _block_code(outer_code)
    nbits = bits.shape[-1]
    pad = (-nbits) % c.k
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), dtype=bits.dtype)], axis=-1
        )
    return c.encode(bits)


def outer_decode(coded_bits: jax.Array, msg_len: int, outer_code: int) -> jax.Array:
    """Coded bits -> corrected message bytes uint8 [..., msg_len]."""
    if outer_code == 2:
        coded = bitops.bits_to_bytes(coded_bits)
        return rs.decode(coded, msg_len)
    if outer_code == 0:
        return bitops.bits_to_bytes(coded_bits[..., : 8 * msg_len])
    c = _block_code(outer_code)
    data_bits = c.decode(coded_bits)
    return bitops.bits_to_bytes(data_bits[..., : 8 * msg_len])


def inner_encoded_bits(nbits: int, inner_code: int) -> int:
    return conv.num_coded_bits(nbits, inner_code)


def inner_encode(bits: jax.Array, inner_code: int) -> jax.Array:
    return conv.encode(bits, inner_code)


def inner_decode(llrs: jax.Array, nbits: int, inner_code: int) -> jax.Array:
    """Soft-input inner decode: LLRs (positive = bit 0) -> bits."""
    return conv.decode(llrs, nbits, inner_code) if inner_code else (
        (llrs[..., :nbits] < 0).astype(jnp.int8)
    )
