"""Pallas TPU kernel: fused NCO derotation + polyphase matched filter.

Symbol recovery (phy/framesync.symbols_from_windows) is, per candidate
window, a complex NCO rotation followed by a 30-tap filter-and-decimate:

    y[s] = sum_v  (win[2s+v] * e^{-j(dphi*(2s+v)+phi)} / gamma) * t_q[v]

The XLA formulation (30 shifted complex slices over [B, K, n] with
per-candidate tap rows) was the hottest stage of the RX pipeline (~2.0 ms
per 4.2 Msample block — tools/profile_rx.py, bench/PROFILE.json): each
shifted slice materializes a pass over the window array, and complex64
arithmetic doubles the traffic again.

This kernel runs one grid step per batch row, processing ALL K candidate
windows of the row as [K, nd] f32 real/imag planes — candidates ride the
sublane axis, so every VPU op runs at full (8, 128) occupancy (the
per-candidate [2, nd] shape of the extraction kernel would idle 6/8
sublanes). Per step:

1. NCO phases th[k, m] = dphi_k * m + phi_k via a broadcast iota — one
   cos/sin pass over [K, nd] (the outer-product trick the XLA path needed
   to avoid a dense transcendental is unnecessary here: the kernel pays
   one in-VMEM pass, not three HBM round trips);
2. derotation + gain normalization as 6 [K, nd] FMAs;
3. the UNDECIMATED filter y_full[n] = sum_v a[n+v] * t[v] as 30
   lane-rolls + FMAs, with per-candidate tap columns t[:, v] broadcast
   from a [K, 32] tap block (rows of framesync._timing_bank30, gathered
   by the caller);
4. the caller decimates y_full[::2] and trims to n_syms in XLA (fused
   into downstream consumers — the 2x overcompute is ~100 us of VPU time,
   far cheaper than a strided even/odd DMA layout).

It consumes the extraction kernel's real/imag f32 planes directly
(kernels/extract.py ``return_planes``), so the complex64 window array of
the old path never materializes in HBM.

Reference scope: liquid flexframesync's mixer + symsync stage
(SURVEY.md section 3.2 steps NCO mix -> matched-filter decim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TAPS = 30  # PULSE_LEN + 1 (framesync._timing_bank30 rows)


def _recover_kernel(wr, wi, dphi, phi, ig, taps, yr_o, yi_o, *, nd: int):
    a_r = wr[0]  # [K, nd]
    a_i = wi[0]
    m = jax.lax.broadcasted_iota(jnp.int32, a_r.shape, 1).astype(jnp.float32)
    th = dphi[0] * m + phi[0]  # [K, 1] broadcasts over lanes
    c = jnp.cos(th)
    s = jnp.sin(th)
    g = ig[0]
    # (wr + j wi) * e^{-j th} * ig
    dr = (a_r * c + a_i * s) * g
    di = (a_i * c - a_r * s) * g
    t = taps[0]  # [K, 32]
    yr = dr * t[:, 0:1]
    yi = di * t[:, 0:1]
    for v in range(1, N_TAPS):
        tv = t[:, v : v + 1]
        yr = yr + pltpu.roll(dr, nd - v, axis=1) * tv
        yi = yi + pltpu.roll(di, nd - v, axis=1) * tv
    yr_o[0] = yr
    yi_o[0] = yi


# Per-step VMEM scales with kt * nd (live [kt, nd] f32 temporaries + roll
# scratch + double-buffering). Empirical coefficient: an unsplit K=69 x
# nd=1152 step measured 16.15 MB -> ~204 bytes per candidate-sample. The
# tile is derived from a budget on kt*nd so long-frame configs (nd up to
# ~4480 at SFO_AUTO_SYMS) shrink the tile instead of blowing the 16 MB
# scoped-vmem limit at Mosaic compile time.
VMEM_BUDGET = 12 * 1024 * 1024  # conservative vs the 16 MB scoped-vmem limit
BYTES_PER_CAND_SAMPLE = 204  # measured, see above


def _candidate_tile(k: int, nd: int) -> int:
    kt = VMEM_BUDGET // (BYTES_PER_CAND_SAMPLE * nd)
    if kt < 8:
        # even the minimum 8-row tile would blow scoped vmem (nd beyond
        # ~7.3k candidate samples) — fail at trace time with the budget
        # math rather than an opaque Mosaic OOM at compile
        raise ValueError(
            f"candidate window of nd={nd} samples needs "
            f"{8 * BYTES_PER_CAND_SAMPLE * nd / 1e6:.1f} MB at the minimum "
            f"8-row tile, over the {VMEM_BUDGET / 1e6:.0f} MB VMEM budget; "
            "split the recovery window before calling the Pallas kernel"
        )
    kt = max(8, (kt // 8) * 8)  # sublane multiple; >=8 keeps VPU rows full
    return min(k, kt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_recover(wr, wi, dphi, phi, ig, taps, *, interpret: bool):
    b, k, nd = wr.shape
    kt = _candidate_tile(k, nd)
    if k % kt:
        pad = kt - k % kt
        grow = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        wr, wi, dphi, phi, ig, taps = map(grow, (wr, wi, dphi, phi, ig, taps))
        k = k + pad
    wspec = pl.BlockSpec((1, kt, nd), lambda bi, ki: (bi, ki, 0))
    sspec = lambda n: pl.BlockSpec((1, kt, n), lambda bi, ki: (bi, ki, 0))
    kernel = functools.partial(_recover_kernel, nd=nd)
    oshape = jax.ShapeDtypeStruct((b, k, nd), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b, k // kt),
        in_specs=[wspec, wspec, sspec(1), sspec(1), sspec(1), sspec(32)],
        out_specs=[wspec, wspec],
        out_shape=[oshape, oshape],
        interpret=interpret,
    )(wr, wi, dphi, phi, ig, taps)


def recover_symbols_planes(
    wr: jax.Array,
    wi: jax.Array,
    dphi: jax.Array,
    phi: jax.Array,
    gamma: jax.Array,
    taps30: jax.Array,
    n_syms: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused derotate + matched filter + decimate.

    wr/wi: [B, K, nd] f32 window planes (nd a 128-multiple, zero-padded);
    dphi/phi/gamma: [B, K] f32 per-candidate NCO parameters;
    taps30: [B, K, 30] f32 per-candidate matched-filter rows.
    Returns [B, K, n_syms] complex64 symbol estimates, bit-compatible with
    phy/framesync.symbols_from_windows up to f32 association order.
    """
    b, k, nd = wr.shape
    ig = (1.0 / jnp.maximum(gamma, 1e-9)).astype(jnp.float32)
    pad = jnp.zeros(taps30.shape[:-1] + (32 - taps30.shape[-1],), jnp.float32)
    taps = jnp.concatenate([taps30.astype(jnp.float32), pad], axis=-1)
    yr, yi = _run_recover(
        wr,
        wi,
        dphi.astype(jnp.float32)[..., None],
        phi.astype(jnp.float32)[..., None],
        ig[..., None],
        taps,
        interpret=interpret,
    )
    yr = yr[:, :k]  # drop KT-tile padding rows
    yi = yi[:, :k]
    y = (yr[..., 0 : 2 * n_syms : 2] + 1j * yi[..., 0 : 2 * n_syms : 2]).astype(
        jnp.complex64
    )
    return y
