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

MXU formulation (block-Toeplitz, same math as correlate_reduced_mm): the
stream is cut into L-sample blocks; all L lags of a block come from
[X_k | X_{k+1}] @ M with M the stacked lower/upper Toeplitz template
matrices. The kernel consumes two pre-shifted [B, NB, L] views (so every
BlockSpec window is aligned — Mosaic cannot slice at +1-block offsets),
runs eight [NBT, L] x [L, F*L] real matmuls per grid step on the MXU, and
fuses the energy Toeplitz matmul, the max/argmax over templates, and the
normalization — only the reduced per-lag rows ever reach HBM.

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

NBT = 128  # signal blocks (of L lags each) per grid step


@functools.lru_cache(maxsize=None)
def _toeplitz_mats(key: tuple) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
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


_TEMPLATE_CACHE: dict[tuple, np.ndarray] = {}


def _template_key(templates: np.ndarray) -> tuple:
    # keyed on raw bytes + shape + dtype (not a lossy int hash): a hash
    # collision between different template sets must not alias cache entries
    key = (templates.tobytes(), templates.shape, str(templates.dtype))
    _TEMPLATE_CACHE[key] = templates
    return key


def _fused_kernel(
    x0r, x0i, x1r, x1i, m1, m2, m3, em,
    rho_o, fb_o, cre_o, cim_o, en_o, *, f: int, l: int, inv_es: float,
):
    """One grid step: NBT lag-blocks (NBT*L lags) of one batch row.

    The two signal blocks are lane-concatenated into one [NBT, 2L] operand
    and the complex correlation X @ M uses Gauss's 3-multiplication trick
    (k1=(ar+ai)Mr, k2=ai(Mr+Mi), k3=ar(Mi-Mr); cr=k1-k2, ci=k1+k3), so a
    grid step is 3 correlation matmuls + 1 energy matmul instead of the
    naive 8 + 2. Matmul operands may be bf16 (default on TPU — the MXU's
    native dtype); accumulation is always f32 via preferred_element_type.
    """
    ar = jnp.concatenate([x0r[0], x1r[0]], axis=-1)  # [NBT, 2L]
    ai = jnp.concatenate([x0i[0], x1i[0]], axis=-1)
    dt = m1.dtype
    dot = lambda a, b: jnp.dot(a, b[:], preferred_element_type=jnp.float32)
    k1 = dot((ar + ai).astype(dt), m1)  # m1 = Mr
    k2 = dot(ai, m2)  # m2 = Mr + Mi
    k3 = dot(ar, m3)  # m3 = Mi - Mr
    cr = k1 - k2
    ci = k1 + k3
    # energy: squares in f32 (bf16 squares would double the rounding); the
    # cast back to the matmul dtype before the 0/1-Toeplitz contraction is
    # the accepted per-term bf16 rounding (pinned at rtol 2e-2 in tests) —
    # the matmul itself accumulates in f32
    arf = ar.astype(jnp.float32)
    aif = ai.astype(jnp.float32)
    en = dot((arf * arf + aif * aif).astype(dt), em)  # [NBT, L]
    mag2 = cr * cr + ci * ci  # [NBT, F*L]
    # max/argmax over templates via F static lane slices
    mbest = mag2[:, :l]
    fb = jnp.zeros_like(mbest)
    cbr = cr[:, :l]
    cbi = ci[:, :l]
    for fi in range(1, f):
        sl = mag2[:, fi * l : (fi + 1) * l]
        upd = sl > mbest
        mbest = jnp.where(upd, sl, mbest)
        fb = jnp.where(upd, float(fi), fb)
        cbr = jnp.where(upd, cr[:, fi * l : (fi + 1) * l], cbr)
        cbi = jnp.where(upd, ci[:, fi * l : (fi + 1) * l], cbi)
    rho_o[0] = mbest * inv_es / jnp.maximum(en, 1e-12)
    fb_o[0] = fb
    cre_o[0] = cbr
    cim_o[0] = cbi
    en_o[0] = en


@functools.partial(jax.jit, static_argnames=("es", "interpret"))
def _run_fused(x0r, x0i, x1r, x1i, mats, es, *, interpret: bool):
    b, nb, l = x0r.shape
    m1, m2, m3, em = mats
    f = m1.shape[1] // l
    n_tiles = nb // NBT
    xspec = pl.BlockSpec((1, NBT, l), lambda bi, i: (bi, i, 0))
    cspec = lambda a: pl.BlockSpec(a.shape, lambda bi, i: (0,) * a.ndim)
    ospec = pl.BlockSpec((1, NBT, l), lambda bi, i: (bi, i, 0))
    kernel = functools.partial(
        _fused_kernel, f=f, l=l, inv_es=float(1.0 / es)
    )
    oshape = jax.ShapeDtypeStruct((b, nb, l), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[xspec] * 4 + [cspec(m) for m in mats],
        out_specs=[ospec] * 5,
        out_shape=[oshape] * 5,
        interpret=interpret,
    )(x0r, x0i, x1r, x1i, *mats)


def _matmul_dtype() -> jnp.dtype:
    """Correlator matmul operand dtype: bf16 by default (the MXU's native
    input dtype — f32 matmuls run multi-pass on TPU), f32 via
    LIQUIDDSP_CORRELATOR_DTYPE=float32 or the ``pallas_f32`` backend.
    Accumulation is f32 either way; bf16 operand rounding costs ~-48 dB
    relative error on rho2/corr, far below the detector's operating SNR
    (parity pinned in tests/test_kernels.py)."""
    import os

    env = os.environ.get("LIQUIDDSP_CORRELATOR_DTYPE", "bfloat16")
    return jnp.float32 if env in ("float32", "f32") else jnp.bfloat16


def correlate_reduced_pallas(
    x: jax.Array,
    templates: np.ndarray,
    interpret: bool = False,
    dtype: jnp.dtype | None = None,
):
    """x [B, T] complex64, templates [F, L] complex -> dict of [B, T] arrays:
    rho2, fbin (int32), corr (complex64), energy. Fused Pallas kernel."""
    f, l = templates.shape
    b, t = x.shape
    if dtype is None:
        dtype = _matmul_dtype()
    es = float(np.sum(np.abs(templates[0]) ** 2))
    mr_np, mi_np, em_np = _toeplitz_mats(_template_key(templates))
    nb = -(-t // l)
    nb = -(-nb // NBT) * NBT  # whole tiles
    pad = (nb + 1) * l - t
    xr = jnp.pad(jnp.real(x).astype(dtype), ((0, 0), (0, pad)))
    xi = jnp.pad(jnp.imag(x).astype(dtype), ((0, 0), (0, pad)))
    xr = xr.reshape(b, nb + 1, l)
    xi = xi.reshape(b, nb + 1, l)
    mats = (
        jnp.asarray(mr_np, dtype),  # Mr
        jnp.asarray(mr_np + mi_np, dtype),  # Mr + Mi
        jnp.asarray(mi_np - mr_np, dtype),  # Mi - Mr
        jnp.asarray(em_np, dtype),
    )
    outs = _run_fused(
        xr[:, :nb], xi[:, :nb], xr[:, 1:], xi[:, 1:], mats, es, interpret=interpret
    )
    flat = lambda a: a.reshape(b, nb * l)[:, :t]
    rho2, fb, cre, cim, en = (flat(o) for o in outs)
    return {
        "rho2": rho2,
        "fbin": fb.astype(jnp.int32),
        "corr": (cre + 1j * cim).astype(jnp.complex64),
        "energy": en,
    }


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

        backend = os.environ.get("LIQUIDDSP_CORRELATOR_BACKEND") or (
            "pallas" if jax.default_backend() not in ("cpu",) else "mm"
        )
    if backend == "mm":
        return correlate_reduced_mm(x, templates)
    if backend == "pallas":
        return correlate_reduced_pallas(x, templates)
    if backend == "pallas_f32":
        return correlate_reduced_pallas(x, templates, dtype=jnp.float32)
    if backend == "pallas_interpret":
        return correlate_reduced_pallas(x, templates, interpret=True, dtype=jnp.float32)
    if backend == "pallas_interpret_bf16":
        return correlate_reduced_pallas(
            x, templates, interpret=True, dtype=jnp.bfloat16
        )
    return correlate_reduced_xla(x, templates)
