"""Frame generator (TX): the reference's flex_tx / liquid flexframegen analog.

Replaces the scalar per-sample pipeline of ``flexframegen_assemble`` +
``flexframegen_write_samples`` (driven at lib/flex_tx_impl.cc:191-209) with a
whole-batch computation: [B] payloads -> [B, frame_samples] complex baseband,
all shapes static per (config, payload_len).

TX chain (see phy/frame_spec.py for the format):
  payload -> CRC24 -> outer FEC -> inner FEC -> interleave -> modulate
  header  -> CRC24 -> Golay     -> QPSK
  [preamble | header syms | payload syms] -> RRC interp (k=2, 'full')
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.ops import bits as bitops
from liquiddsp_tpu.ops import crc, fir, modem, msequence, rrc
from liquiddsp_tpu.ops.fec import registry
from liquiddsp_tpu.phy import frame_spec as fs


def build_header_bytes(cfg: FrameConfig, batch: int, user_header: jax.Array | None) -> jax.Array:
    """[B, 19] header bytes: 14 user + payload_len u16 BE + mod + inner + outer.

    Default user header is 14 zero bytes, as the reference's
    (lib/flex_tx_impl.cc:58-59).
    """
    if user_header is None:
        user_header = jnp.zeros((batch, fs.HEADER_USER_BYTES), dtype=jnp.uint8)
    proto = jnp.tile(
        jnp.asarray(
            [
                (cfg.payload_len >> 8) & 0xFF,
                cfg.payload_len & 0xFF,
                cfg.modulation,
                cfg.inner_code,
                cfg.outer_code,
            ],
            dtype=jnp.uint8,
        ),
        (batch, 1),
    )
    return jnp.concatenate([user_header, proto], axis=-1)


def header_symbols(cfg: FrameConfig, batch: int, user_header: jax.Array | None = None) -> jax.Array:
    """[B, HEADER_SYMS] QPSK header symbols (CRC24 + Golay + QPSK)."""
    from liquiddsp_tpu.ops.fec.block import golay2412

    hdr = build_header_bytes(cfg, batch, user_header)
    hdr = crc.crc24_append(hdr)  # [B, 22]
    bits = bitops.bytes_to_bits(hdr)  # [B, 176]
    pad = fs.HEADER_BITS_PADDED - fs.HEADER_BITS
    bits = jnp.concatenate([bits, jnp.zeros((batch, pad), dtype=bits.dtype)], axis=-1)
    coded = golay2412().encode(bits)  # [B, 360]
    idx = modem.bits_to_indices(coded, 2)
    return modem.modulate(idx, fs.HEADER_MOD)


def payload_symbols(payload: jax.Array, cfg: FrameConfig) -> jax.Array:
    """[B, payload_len] uint8 -> [B, payload_syms] complex symbols."""
    spec = fs.FrameSpec(cfg)
    msg = crc.crc24_append(payload)  # [B, L+3]
    obits = registry.outer_encode(msg, cfg.outer_code)
    ibits = registry.inner_encode(obits, cfg.inner_code)
    perm = jnp.asarray(fs.interleave_perm(spec.inner_bits))
    ibits = ibits[..., perm]
    pad = spec.payload_pad_bits
    if pad:
        ibits = jnp.concatenate(
            [ibits, jnp.zeros(ibits.shape[:-1] + (pad,), dtype=ibits.dtype)], axis=-1
        )
    idx = modem.bits_to_indices(ibits, spec.bps)
    return modem.modulate(idx, cfg.modulation)


def assemble_symbols(
    payload: jax.Array, cfg: FrameConfig, user_header: jax.Array | None = None
) -> jax.Array:
    """[B, payload_len] payload bytes -> [B, frame_syms] symbols."""
    batch = payload.shape[0]
    pre = jnp.tile(jnp.asarray(msequence.preamble_symbols())[None, :], (batch, 1))
    hdr = header_symbols(cfg, batch, user_header)
    pay = payload_symbols(payload, cfg)
    return jnp.concatenate([pre, hdr, pay], axis=-1)


def write_samples(symbols: jax.Array) -> jax.Array:
    """[B, n_syms] -> [B, k*n_syms + 28] RRC-interpolated baseband (k=2)."""
    h = rrc.matched_taps()
    return fir.interp_full(symbols, h, fs.K_SAMP)


def framegen(
    payload: jax.Array, cfg: FrameConfig, user_header: jax.Array | None = None
) -> jax.Array:
    """Full TX: [B, payload_len] uint8 -> [B, frame_samples] complex64.

    The liquid call-chain analog: assemble -> getframelen -> write_samples
    (lib/flex_tx_impl.cc:198-201), as one fused XLA computation.
    """
    return write_samples(assemble_symbols(payload, cfg, user_header))


def frame_length(cfg: FrameConfig) -> int:
    """flexframegen_getframelen analog (lib/flex_tx_impl.cc:199)."""
    return fs.FrameSpec(cfg).frame_samples
