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

    Nearest-phase polyphase interpolation (liquid resamp_crcf analog).
    ``rate`` is STATIC per compile, so the whole index plan (integer base,
    phase row) is computed in numpy at trace time. Near-unity rates (ppm
    clock offsets — BASELINE config 3's per-channel resampling) take a
    fully static formulation: the integer sample offset d = base[i] - i is
    piecewise-constant with at most ~|1-rate|*out_len + 1 runs, so the
    output is a concatenation of statically-sliced segments, each a
    ``ntaps``-term shifted-slice FMA with a constant [seg_len, ntaps] tap
    gather baked in at trace time — no device gathers at all (the gather
    formulation materialized a [.., out_len, ntaps] window tensor: ~16x
    slower than the whole RX at 64x65536, measured r5). Rates far from 1
    (many runs) keep the gather path.
    """
    cutoff = 0.5 * min(1.0, rate)
    bank = _frac_bank(num_phases, ntaps, cutoff)  # numpy [P, ntaps]
    pos = np.arange(out_len) / rate  # input-domain positions (static)
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    phase_r = np.round(frac * num_phases).astype(np.int64)
    base = base + phase_r // num_phases
    phase = phase_r % num_phases
    taps_np = bank[phase]  # [out_len, ntaps] static
    half = (ntaps - 1) // 2
    lead = [(0, 0)] * (x.ndim - 1)

    d = base - np.arange(out_len)  # integer shift per output (static)
    runs = np.nonzero(np.diff(d))[0] + 1
    if len(runs) + 1 <= 32:
        # Near-unity (ppm-rate) fast path: FARROW structure. The previous
        # per-tap shifted-slice stencil made ntaps(=33) separate HBM
        # passes over the block (measured ~3 ms at 64x65536 — as slow as
        # the whole RX); a polynomial-in-mu factorization of the
        # fractional-delay bank, bank(mu)[v] ~= sum_k mu^k C[k, v], turns
        # it into K+1 FIXED-tap convolutions (ONE MXU conv with K+1 output
        # features = one pass over the input) plus an elementwise Horner
        # combine with the exact per-output fractional delay mu — which
        # also REMOVES the nearest-of-num_phases quantization. The fit and
        # its residual are trace-time numpy; if the bank is too sharp to
        # fit (never for this windowed-sinc family), fall back to the
        # stencil path below.
        K = 6
        fine = 256
        mu_g = np.arange(fine) / fine
        bank_f = _frac_bank(fine, ntaps, cutoff)  # [fine, ntaps]
        V = mu_g[:, None] ** np.arange(K + 1)[None, :]
        C, *_ = np.linalg.lstsq(V, bank_f, rcond=None)  # [K+1, ntaps]
        resid = float(np.abs(V @ C - bank_f).max())
        if resid < 1e-3:
            Dmax = int(abs(d).max())
            xp = jnp.pad(x, lead + [(half, ntaps + Dmax + 1)])
            bshape = x.shape[:-1]
            cplx = jnp.iscomplexobj(x)
            if cplx:
                xf = jnp.stack([jnp.real(xp), jnp.imag(xp)], axis=0)
            else:
                xf = xp.astype(jnp.float32)[None]
            xf2 = xf.reshape((-1, 1, xf.shape[-1]))  # [P*B, 1, Lp] f32
            kern = jnp.asarray(C.astype(np.float32))[:, None, :]
            z = jax.lax.conv_general_dilated(
                xf2, kern, (1,), "VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
            )  # [2*B, K+1, M]; z[:, k, m] = sum_v C[k, v] xp[m + v]
            mu_j = jnp.asarray(frac.astype(np.float32))
            bounds = [0, *runs.tolist(), out_len]
            segs = []
            for a, b in zip(bounds[:-1], bounds[1:]):
                dv = int(d[a])
                acc = z[:, K, a + dv : b + dv]
                for k in range(K - 1, -1, -1):
                    acc = acc * mu_j[a:b] + z[:, k, a + dv : b + dv]
                segs.append(acc)
            yf = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=-1)
            yf = yf.reshape((2,) + bshape + (out_len,))
            return (yf[0] + 1j * yf[1]).astype(x.dtype)
        # stencil fallback: per run, d is constant -> every tap v reads a
        # STATIC slice x[a+dv : b+dv] (taps transposed so each tap's
        # per-position vector is a contiguous lane-dim row)
        xp = jnp.pad(x, lead + [(half, ntaps + int(abs(d).max()) + 1)])
        taps_t = jnp.asarray(np.ascontiguousarray(taps_np.T))  # [ntaps, L]
        bounds = [0, *runs.tolist(), out_len]
        segs = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            dv = int(d[a])
            y = jnp.zeros(x.shape[:-1] + (b - a,), dtype=x.dtype)
            for v in range(ntaps):
                y = y + xp[..., a + dv + v : b + dv + v] * taps_t[v, a:b]
            segs.append(y)
        return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=-1)

    xp = jnp.pad(x, lead + [(half, ntaps + int(abs(d).max()) + 1)])
    idx = jnp.asarray(base[:, None] + np.arange(ntaps)[None, :])
    windows = xp[..., idx]  # [..., out_len, ntaps]
    return jnp.sum(windows * jnp.asarray(taps_np), axis=-1)
