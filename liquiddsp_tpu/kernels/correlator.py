"""Pallas TPU kernel: fused multi-template preamble correlator.

The hot loop of frame detection (SURVEY.md section 3.4: per-sample
``qdetector_cccf_execute`` in the reference; here the whole block at once).
For every lag t it computes

    c_f[t] = sum_n x[t+n] * conj(s_f[n])        (F templates, L = 128 taps)
    E[t]   = sum_n |x[t+n]|^2
    rho2[t] = max_f |c_f[t]|^2 / (E_s * E[t])

and emits only the reduced per-lag quantities (rho2, argmax bin, peak
correlation) — never materializing the [F, T] correlation surface in HBM,
which is what the XLA FFT path does (phy/detector.correlate).

MXU formulation: a [TILE, L] window matrix is built in VMEM from a
[TILE + L] strip of the signal (L static slices), then one
[TILE, L] x [L, 2F] matmul produces all F complex correlations; window
energy is a VPU row-reduction over the same matrix. Arithmetic intensity
~2*L*F flops per input sample on the MXU vs ~8 bytes of HBM traffic.

The public entry ``correlate_reduced`` dispatches to the Pallas kernel on
TPU and to an equivalent XLA fallback elsewhere (tests run both and compare).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # lags per grid step


def _kernel(xr_hbm, xi_hbm, s_ref, out_ref, *, l: int, f: int, es: float):
    """One grid step: batch row b, lags [i*TILE, (i+1)*TILE).

    xr/xi live in HBM untiled (overlapping [TILE + L] strips are DMA'd per
    tile — BlockSpec offsets are block-shape-multiples, so overlap needs
    manual copies; and TPU ANY-space blocks must be whole-array, so the
    batch axis is a grid dimension, not a vmap). s: [L, 2F] template matrix
    (conj packed). out block: [1, 8, TILE] rows = (rho2, fbin, c_re, c_im,
    energy, 0, 0, 0) — lag on the lane axis.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    def body(xr_v, xi_v, sem):
        cp1 = pltpu.make_async_copy(
            xr_hbm.at[b, pl.ds(i * TILE, TILE + l)], xr_v, sem
        )
        cp1.start()
        cp1.wait()
        cp2 = pltpu.make_async_copy(
            xi_hbm.at[b, pl.ds(i * TILE, TILE + l)], xi_v, sem
        )
        cp2.start()
        cp2.wait()
        _compute(xr_v[:], xi_v[:], s_ref, out_ref, l=l, f=f, es=es)

    pl.run_scoped(
        body,
        pltpu.VMEM((TILE + l,), jnp.float32),
        pltpu.VMEM((TILE + l,), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


def _compute(xr, xi, s_ref, out_ref, *, l: int, f: int, es: float):
    # window matrices [TILE, L] via L static slices (dynamic_slice on values
    # does not lower in Pallas TPU; slice starts here are Python ints)
    wr = jnp.stack([xr[n : n + TILE] for n in range(l)], axis=1)
    wi = jnp.stack([xi[n : n + TILE] for n in range(l)], axis=1)
    s = s_ref[:]  # [L, 2F]: [conj_re | conj_im] ... see wrapper packing
    sr = s[:, :f]  # Re(conj(s)) = Re(s)
    si = s[:, f:]  # -Im(s) = Im(conj(s))
    # c = (wr + j wi) @ (sr + j si): re = wr@sr - wi@si ; im = wr@si + wi@sr
    c_re = jnp.dot(wr, sr, preferred_element_type=jnp.float32) - jnp.dot(
        wi, si, preferred_element_type=jnp.float32
    )
    c_im = jnp.dot(wr, si, preferred_element_type=jnp.float32) + jnp.dot(
        wi, sr, preferred_element_type=jnp.float32
    )
    mag2 = c_re * c_re + c_im * c_im  # [TILE, F]
    energy = jnp.sum(wr * wr + wi * wi, axis=1)  # [TILE]
    best = jnp.argmax(mag2, axis=1).astype(jnp.int32)  # [TILE]
    m2 = jnp.max(mag2, axis=1)
    rho2 = m2 / (es * jnp.maximum(energy, 1e-12))
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE, f), 1) == best[:, None]
    ).astype(jnp.float32)
    cb_re = jnp.sum(c_re * onehot, axis=1)
    cb_im = jnp.sum(c_im * onehot, axis=1)
    zero = jnp.zeros_like(rho2)
    out_ref[0, :, :] = jnp.stack(
        [rho2, best.astype(jnp.float32), cb_re, cb_im, energy, zero, zero, zero],
        axis=0,
    )


def _pack_templates(templates: np.ndarray) -> np.ndarray:
    """[F, L] complex -> [L, 2F] float32 (conj packed: [Re(s) | Im(s)]...).

    With columns sr = Re(s), si = -Im(s), the kernel's complex matmul
    computes sum x[t+n] * conj(s[n]).
    """
    f, l = templates.shape
    sr = np.real(templates).T.astype(np.float32)  # [L, F]
    si = (-np.imag(templates).T).astype(np.float32)
    return np.concatenate([sr, si], axis=1)  # [L, 2F]


@functools.partial(jax.jit, static_argnames=("interpret", "es"))
def _run_batch(xr, xi, s_mat, es, *, interpret: bool):
    """xr/xi [B, T_padded] -> [B, 8, n_tiles*TILE] packed rows."""
    b, t_padded = xr.shape
    l = s_mat.shape[0]
    f = s_mat.shape[1] // 2
    n_tiles = (t_padded - l) // TILE
    grid = (b, n_tiles)
    kernel = functools.partial(_kernel, l=l, f=f, es=float(es))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, n_tiles * TILE), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((l, 2 * f), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xr, xi, s_mat)
    return out


def correlate_reduced_pallas(
    x: jax.Array, templates: np.ndarray, interpret: bool = False
):
    """x [B, T] complex64, templates [F, L] complex -> dict of [B, T] arrays:
    rho2, fbin (int32), corr (complex64), energy."""
    f, l = templates.shape
    b, t = x.shape
    es = float(np.sum(np.abs(templates[0]) ** 2))
    n_tiles = -(-t // TILE)
    pad = n_tiles * TILE + l - t
    xr = jnp.pad(jnp.real(x).astype(jnp.float32), ((0, 0), (0, pad)))
    xi = jnp.pad(jnp.imag(x).astype(jnp.float32), ((0, 0), (0, pad)))
    s_mat = jnp.asarray(_pack_templates(templates))
    out = _run_batch(xr, xi, s_mat, es, interpret=interpret)  # [B, 8, nt*TILE]
    out = out[:, :, :t]
    return {
        "rho2": out[:, 0],
        "fbin": out[:, 1].astype(jnp.int32),
        "corr": (out[:, 2] + 1j * out[:, 3]).astype(jnp.complex64),
        "energy": out[:, 4],
    }


@functools.lru_cache(maxsize=None)
def _toeplitz_mats(key: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block-Toeplitz template matrices for the matmul correlator.

    For block length L (= template length) and lag o within a block, the
    window starting at k*L+o spans signal blocks k and k+1:

        c[k*L+o] = sum_i A[i]*conj(s[i-o])   (i >= o;   A = block k)
                 + sum_j B[j]*conj(s[L+j-o]) (j <  o;   B = block k+1)

    so c_block = [A | B] @ M with M[0:L] lower-Toeplitz and M[L:2L]
    upper-Toeplitz in conj(s). Returns (Mr, Mi) [2L, F*L] float32 packed
    over templates, plus the all-ones energy Toeplitz [2L, L]."""
    templates = _TEMPLATE_CACHE[key]
    f, l = templates.shape
    m = np.zeros((2 * l, f, l), dtype=np.complex64)
    for fi in range(f):
        cs = np.conj(templates[fi])
        for o in range(l):
            m[o:l, fi, o] = cs[: l - o]
            m[l : l + o, fi, o] = cs[l - o :]
    m = m.reshape(2 * l, f * l)
    e = np.zeros((2 * l, l), dtype=np.float32)
    for o in range(l):
        e[o:l, o] = 1.0
        e[l : l + o, o] = 1.0
    return (
        np.real(m).astype(np.float32),
        np.imag(m).astype(np.float32),
        e,
    )


_TEMPLATE_CACHE: dict[int, np.ndarray] = {}


def _template_key(templates: np.ndarray) -> int:
    key = hash(templates.tobytes())
    _TEMPLATE_CACHE[key] = templates
    return key


def correlate_reduced_mm(x: jax.Array, templates: np.ndarray):
    """MXU matmul correlator (pure XLA): block-Toeplitz formulation.

    Same contract as correlate_reduced_pallas but with no Pallas dependency:
    the [B, T] stream is cut into L-sample blocks and all F correlations for
    a block of lags come from one [NB, 2L] x [2L, F*L] matmul, which XLA
    tiles straight onto the MXU. Energy uses the same structure with an
    all-ones Toeplitz, so there is no cumsum scan anywhere.
    """
    f, l = templates.shape
    b, t = x.shape
    es = float(np.sum(np.abs(templates[0]) ** 2))
    mr_np, mi_np, em_np = _toeplitz_mats(_template_key(templates))
    nb = -(-t // l)
    pad = (nb + 1) * l - t
    xr = jnp.pad(jnp.real(x).astype(jnp.float32), ((0, 0), (0, pad)))
    xi = jnp.pad(jnp.imag(x).astype(jnp.float32), ((0, 0), (0, pad)))
    xr = xr.reshape(b, nb + 1, l)
    xi = xi.reshape(b, nb + 1, l)
    xr_cat = jnp.concatenate([xr[:, :nb], xr[:, 1:]], axis=-1)  # [B, NB, 2L]
    xi_cat = jnp.concatenate([xi[:, :nb], xi[:, 1:]], axis=-1)
    mr = jnp.asarray(mr_np)
    mi = jnp.asarray(mi_np)
    # c = (xr + j xi) @ (Mr + j Mi)
    cr = jnp.einsum("bnk,kf->bnf", xr_cat, mr) - jnp.einsum(
        "bnk,kf->bnf", xi_cat, mi
    )
    ci = jnp.einsum("bnk,kf->bnf", xr_cat, mi) + jnp.einsum(
        "bnk,kf->bnf", xi_cat, mr
    )
    cr = cr.reshape(b, nb, f, l)
    ci = ci.reshape(b, nb, f, l)
    mag2 = cr * cr + ci * ci  # [B, NB, F, L]
    best = jnp.argmax(mag2, axis=2).astype(jnp.int32)  # [B, NB, L]
    m2 = jnp.max(mag2, axis=2)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, mag2.shape, 2) == best[:, :, None, :]
    )
    cb_re = jnp.sum(jnp.where(onehot, cr, 0.0), axis=2)
    cb_im = jnp.sum(jnp.where(onehot, ci, 0.0), axis=2)
    p_cat = xr_cat * xr_cat + xi_cat * xi_cat
    energy = jnp.einsum("bnk,kl->bnl", p_cat, jnp.asarray(em_np))  # [B, NB, L]
    rho2 = m2 / (es * jnp.maximum(energy, 1e-12))
    flat = lambda a: a.reshape(b, nb * l)[:, :t]
    return {
        "rho2": flat(rho2),
        "fbin": flat(best),
        "corr": (flat(cb_re) + 1j * flat(cb_im)).astype(jnp.complex64),
        "energy": flat(energy),
    }


def correlate_reduced_xla(x: jax.Array, templates: np.ndarray):
    """Equivalent XLA fallback built on the FFT overlap-save correlator."""
    from liquiddsp_tpu.phy import detector as det

    corr, energy = det.correlate(x)  # corr [B, F, T]
    es = float(np.sum(np.abs(templates[0]) ** 2))
    mag2 = jnp.abs(corr) ** 2
    fbin = jnp.argmax(mag2, axis=1).astype(jnp.int32)  # [B, T]
    m2 = jnp.max(mag2, axis=1)
    rho2 = m2 / (es * jnp.maximum(energy, 1e-12))
    cbest = jnp.take_along_axis(corr, fbin[:, None, :], axis=1)[:, 0]
    return {"rho2": rho2, "fbin": fbin, "corr": cbest, "energy": energy}


def correlate_reduced(x: jax.Array, templates: np.ndarray, backend: str = "auto"):
    """Dispatch: Pallas on TPU, XLA elsewhere (or forced via ``backend`` /
    the LIQUIDDSP_CORRELATOR_BACKEND env var)."""
    if backend == "auto":
        import os

        backend = os.environ.get("LIQUIDDSP_CORRELATOR_BACKEND") or "mm"
    if backend == "mm":
        return correlate_reduced_mm(x, templates)
    if backend == "pallas":
        return correlate_reduced_pallas(x, templates)
    if backend == "pallas_interpret":
        return correlate_reduced_pallas(x, templates, interpret=True)
    return correlate_reduced_xla(x, templates)
