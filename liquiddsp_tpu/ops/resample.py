"""Polyphase resampling, batched — BASELINE config 3's "per-channel
polyphase resampling" and the liquid firinterp/firdecim/resamp analog.

- ``interp(x, p, taps)``: integer upsampling by P (polyphase FIR).
- ``decim(x, q, taps)``: integer decimation by Q with anti-alias FIR.
- ``rational(x, p, q, taps)``: rational P/Q resampling (polyphase interp
  then decimate — single conv via lhs_dilation + stride).
- ``arbitrary(x, rate, num_phases)``: arbitrary-ratio resampling via a
  fractional-delay polyphase bank: output sample i reads input position
  i/rate with the nearest-of-``num_phases`` fractional filter — a gather +
  windowed dot, fully parallel.
- ``design_lowpass``: windowed-sinc anti-alias prototype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from liquiddsp_tpu.ops import fir


@functools.lru_cache(maxsize=None)
def design_lowpass(cutoff: float, ntaps: int = 65) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, unit DC gain. cutoff in (0, 0.5]
    cycles/sample."""
    n = np.arange(ntaps) - (ntaps - 1) / 2.0
    h = 2 * cutoff * np.sinc(2 * cutoff * n)
    h *= np.kaiser(ntaps, 7.0)
    return (h / np.sum(h)).astype(np.float32)


def interp(x: jax.Array, p: int, taps: np.ndarray | None = None) -> jax.Array:
    """[..., T] -> [..., p*T]: zero-stuff + anti-image filter (gain p)."""
    if taps is None:
        taps = design_lowpass(0.5 / p) * p
    y = fir.interp_full(x, jnp.asarray(taps), p)
    delay = (len(taps) - 1) // 2
    return y[..., delay : delay + p * x.shape[-1]]


def decim(x: jax.Array, q: int, taps: np.ndarray | None = None) -> jax.Array:
    """[..., T] -> [..., T//q]: anti-alias filter + take every q-th."""
    if taps is None:
        taps = design_lowpass(0.5 / q)
    y = fir.conv_same(x, jnp.asarray(taps))
    return y[..., ::q]


def rational(x: jax.Array, p: int, q: int, taps: np.ndarray | None = None) -> jax.Array:
    """[..., T] -> [..., (p*T)//q]: resample by rational factor p/q."""
    if taps is None:
        taps = design_lowpass(0.5 / max(p, q)) * p
    up = fir.interp_full(x, jnp.asarray(taps), p)
    delay = (len(taps) - 1) // 2
    up = up[..., delay : delay + p * x.shape[-1]]
    return up[..., ::q]


@functools.lru_cache(maxsize=None)
def _frac_bank(num_phases: int, ntaps: int, cutoff: float) -> np.ndarray:
    """[num_phases, ntaps] fractional-delay low-pass bank (delay p/P)."""
    bank = []
    for ph in range(num_phases):
        n = np.arange(ntaps) - (ntaps - 1) / 2.0 - ph / num_phases
        h = 2 * cutoff * np.sinc(2 * cutoff * n)
        h *= np.kaiser(ntaps, 7.0)
        bank.append(h / np.sum(h))
    return np.asarray(bank, dtype=np.float32)


def arbitrary(x: jax.Array, rate: float, out_len: int, num_phases: int = 32,
              ntaps: int = 33) -> jax.Array:
    """Arbitrary-ratio resample: y[i] = x(i / rate), [..., T] -> [..., out_len].

    Nearest-phase polyphase interpolation (liquid resamp_crcf analog),
    expressed as a gather of input windows + per-output-phase dot products.
    """
    cutoff = 0.5 * min(1.0, rate)
    bank = jnp.asarray(_frac_bank(num_phases, ntaps, cutoff))
    t_in = x.shape[-1]
    pos = jnp.arange(out_len) / rate  # input-domain positions
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base
    phase = jnp.round(frac * num_phases).astype(jnp.int32) % num_phases
    # adjust base when frac rounds up to a full sample
    base = base + (jnp.round(frac * num_phases) // num_phases).astype(jnp.int32)
    half = (ntaps - 1) // 2
    pad = ntaps
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, pad)])
    idx = base[:, None] + jnp.arange(ntaps)[None, :]  # [out_len, ntaps]
    windows = xp[..., idx]  # [..., out_len, ntaps]
    taps = bank[phase]  # [out_len, ntaps]
    return jnp.sum(windows * taps, axis=-1)
