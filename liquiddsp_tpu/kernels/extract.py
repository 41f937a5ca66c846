"""Pallas TPU kernel: batched variable-offset window extraction.

The RX pipeline repeatedly needs "K windows of N samples at per-candidate
start offsets" from each stream row — candidate frame windows for symbol
recovery (phy/framesync.extract_symbols) and preamble windows for the fine
CFO estimate (phy/detector.detect). XLA lowers a vmap'd dynamic_slice to a
per-candidate gather whose cost is dominated by per-slice overhead (~2.5 us
per candidate on this backend); this kernel instead streams one async DMA
HBM->VMEM per (candidate, re/im) pair, double-buffered across candidates,
so the whole extraction runs near HBM rate.

Mosaic constraints shaping the design (this backend):
- complex dtypes unsupported in kernels -> separate f32 real/imag planes;
- ANY-space inputs must be whole-array refs -> batch row is a grid dim,
  starts arrive via scalar prefetch (SMEM);
- DMA slice offsets in the lane dim must be provably 128-aligned -> the
  start is decomposed as 128*q + r outside; the kernel DMAs the aligned
  superset window at 128*q and rotates by r in-VMEM (tpu dynamic rotate);
- DMA destinations must be whole (sublane, lane) tiles -> outputs carry a
  singleton sublane axis per candidate and lane sizes are 128-multiples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _extract_kernel(
    q_ref, r_ref, x_hbm, outr_ref, outi_ref, *, n_out: int, n_dma: int, k: int
):
    """x_hbm is [B, 2, Tpad] (real plane stacked on imag) so ONE DMA per
    candidate moves both components as a [2, n_dma] tile."""
    b = pl.program_id(0)

    depth = 8  # DMA pipeline depth (hides per-copy latency)

    def body(scr, sems):
        def issue(kk):
            buf = kk % depth
            q0 = q_ref[b, kk]
            cp = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(q0 * LANE, n_dma)],
                scr.at[buf],
                sems.at[buf],
            )
            cp.start()
            return cp

        pending = [issue(kk) for kk in range(min(depth - 1, k))]
        for kk in range(k):
            if kk + depth - 1 < k:
                pending.append(issue(kk + depth - 1))
            pending.pop(0).wait()
            buf = kk % depth
            shift = n_dma - r_ref[b, kk]  # left-rotate by r
            w = pltpu.roll(scr[buf], shift, axis=1)
            outr_ref[0, kk] = w[0:1, :n_out]
            outi_ref[0, kk] = w[1:2, :n_out]

    pl.run_scoped(
        body,
        pltpu.VMEM((depth, 2, n_dma), jnp.float32),
        pltpu.SemaphoreType.DMA((depth,)),
    )


@functools.partial(jax.jit, static_argnames=("n_out", "n_dma", "interpret"))
def _extract_pallas(xr, xi, q, r, *, n_out: int, n_dma: int, interpret: bool):
    b, t = xr.shape
    k = q.shape[1]
    # stack real on imag [B, 2, T]: one DMA per candidate moves both planes
    x2 = jnp.stack([xr, xi], axis=1)
    kernel = functools.partial(_extract_kernel, n_out=n_out, n_dma=n_dma, k=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, k, 1, n_out), lambda bi, *_: (bi, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k, 1, n_out), lambda bi, *_: (bi, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    outr, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 1, n_out), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 1, n_out), jnp.float32),
        ],
        interpret=interpret,
    )(q, r, x2)
    return outr[:, :, 0, :], outi[:, :, 0, :]


def extract_windows_xla(x: jax.Array, starts: jax.Array, n: int) -> jax.Array:
    """[B, T] complex, starts [B, K] int32 -> windows [B, K, n] complex64.

    Reads past T return zeros (the caller guarantees starts <= T-1).
    XLA fallback: vmap'd dynamic_slice.
    """
    xp = jnp.pad(x, ((0, 0), (0, n)))
    return jax.vmap(
        lambda row, ss: jax.vmap(
            lambda s0: jax.lax.dynamic_slice_in_dim(row, s0, n), in_axes=0
        )(ss)
    )(xp, starts)


def extract_windows(
    x: jax.Array,
    starts: jax.Array,
    n: int,
    backend: str = "auto",
    return_planes: bool = False,
) -> jax.Array:
    """Dispatch: Pallas DMA kernel on TPU, XLA fallback elsewhere (or forced
    via ``backend`` / the LIQUIDDSP_EXTRACT_BACKEND env var).

    ``return_planes=True`` returns the raw (real, imag) f32 planes
    [B, K, n_out] (n_out = n rounded up to a lane multiple, zero-padded)
    instead of a complex array — consumers like the fused symbol-recovery
    kernel (kernels/recover.py) read the planes directly, skipping a
    complex64 materialization pass over the window array."""
    if backend == "auto":
        import os

        backend = os.environ.get("LIQUIDDSP_EXTRACT_BACKEND") or (
            "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        )
    if backend in ("pallas", "pallas_interpret"):
        interpret = backend == "pallas_interpret"
        n_out = -(-n // LANE) * LANE
        n_dma = n_out + LANE
        starts = starts.astype(jnp.int32)
        q = starts // LANE
        r = starts - q * LANE
        xr = jnp.pad(jnp.real(x).astype(jnp.float32), ((0, 0), (0, n_dma)))
        xi = jnp.pad(jnp.imag(x).astype(jnp.float32), ((0, 0), (0, n_dma)))
        outr, outi = _extract_pallas(
            xr, xi, q, r, n_out=n_out, n_dma=n_dma, interpret=interpret
        )
        if return_planes:
            if n_out != n:
                # honor the documented zero tail: the aligned DMA superset
                # leaves trailing stream samples in [n, n_out) — mask them so
                # the Pallas and XLA planes agree exactly (one multiply, fused
                # into the consumer by XLA)
                keep = (jnp.arange(n_out) < n).astype(jnp.float32)
                outr = outr * keep
                outi = outi * keep
            return outr, outi
        return (outr[..., :n] + 1j * outi[..., :n]).astype(jnp.complex64)
    w = extract_windows_xla(x, starts, n)
    if return_planes:
        n_out = -(-n // LANE) * LANE
        lead = [(0, 0)] * (w.ndim - 1)
        wp = jnp.pad(w, lead + [(0, n_out - n)])
        return jnp.real(wp).astype(jnp.float32), jnp.imag(wp).astype(jnp.float32)
    return w
