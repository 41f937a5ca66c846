"""ctypes bindings to the native golden oracle (golden/golden.cpp).

The golden library is the framework's liquid-dsp analog: an independent
scalar C++ implementation of every codec/DSP primitive, used by the test
suite as the bit-exactness oracle for the batched JAX ops (SURVEY.md
section 7.1). Built via cmake (golden/CMakeLists.txt) or make (golden/
Makefile); this module auto-builds on first use if the .so is missing.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")

_U8 = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_F32 = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _find_or_build() -> str:
    candidates = [
        os.path.join(_GOLDEN_DIR, "build", "libgolden.so"),
        os.path.join(_GOLDEN_DIR, "libgolden.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    try:
        build = os.path.join(_GOLDEN_DIR, "build")
        os.makedirs(build, exist_ok=True)
        subprocess.run(["cmake", "-S", _GOLDEN_DIR, "-B", build, "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", build, "-j"], check=True, capture_output=True)
        return candidates[0]
    except (OSError, subprocess.CalledProcessError):
        subprocess.run(["make", "-C", _GOLDEN_DIR], check=True, capture_output=True)
        return candidates[1]


@functools.lru_cache(maxsize=None)
def lib() -> ctypes.CDLL:
    so = ctypes.CDLL(_find_or_build())
    so.golden_msequence.argtypes = [ctypes.c_uint] * 4 + [_U8]
    so.golden_preamble.argtypes = [_F32, _F32, ctypes.c_uint]
    so.golden_crc24.restype = ctypes.c_uint32
    so.golden_crc24.argtypes = [_U8, ctypes.c_uint]
    so.golden_crc16.restype = ctypes.c_uint32
    so.golden_crc16.argtypes = [_U8, ctypes.c_uint]
    so.golden_rrc_taps.argtypes = [ctypes.c_uint, ctypes.c_uint, ctypes.c_double,
                                   ctypes.c_double, _F32]
    so.golden_constellation.restype = ctypes.c_int
    so.golden_constellation.argtypes = [ctypes.c_uint, _F32, _F32]
    so.golden_block_encode.restype = ctypes.c_int
    so.golden_block_encode.argtypes = [ctypes.c_uint, _U8, ctypes.c_uint, _U8]
    so.golden_block_decode.restype = ctypes.c_int
    so.golden_block_decode.argtypes = [ctypes.c_uint, _U8, ctypes.c_uint, _U8]
    so.golden_conv_encode.restype = ctypes.c_int
    so.golden_conv_encode.argtypes = [ctypes.c_uint, _U8, ctypes.c_uint, _U8]
    so.golden_viterbi_decode.restype = ctypes.c_int
    so.golden_viterbi_decode.argtypes = [ctypes.c_uint, _U8, ctypes.c_uint,
                                         ctypes.c_uint, _U8]
    so.golden_rs_encode_block.argtypes = [_U8, ctypes.c_uint, _U8]
    so.golden_rs_decode_block.restype = ctypes.c_int
    so.golden_rs_decode_block.argtypes = [_U8, ctypes.c_uint, _U8]
    return so


def msequence(m: int, g: int, a: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint8)
    lib().golden_msequence(m, g, a, n, out)
    return out


def preamble(n: int = 64) -> np.ndarray:
    re = np.zeros(n, dtype=np.float32)
    im = np.zeros(n, dtype=np.float32)
    lib().golden_preamble(re, im, n)
    return (re + 1j * im).astype(np.complex64)


def crc24(data: bytes | np.ndarray) -> int:
    arr = np.frombuffer(bytes(data), dtype=np.uint8).copy()
    return int(lib().golden_crc24(arr, len(arr)))


def crc16(data: bytes | np.ndarray) -> int:
    arr = np.frombuffer(bytes(data), dtype=np.uint8).copy()
    return int(lib().golden_crc16(arr, len(arr)))


def rrc_taps(k: int = 2, m: int = 7, beta: float = 0.3, dt: float = 0.0) -> np.ndarray:
    out = np.zeros(2 * k * m + 1, dtype=np.float32)
    lib().golden_rrc_taps(k, m, beta, dt, out)
    return out


def constellation(mod: int) -> np.ndarray:
    re = np.zeros(64, dtype=np.float32)
    im = np.zeros(64, dtype=np.float32)
    m = lib().golden_constellation(mod, re, im)
    assert m > 0
    return (re[:m] + 1j * im[:m]).astype(np.complex64)


def block_encode(outer: int, bits: np.ndarray, k: int) -> np.ndarray:
    nblocks = len(bits) // k
    out = np.zeros(nblocks * 128, dtype=np.uint8)
    n = lib().golden_block_encode(outer, np.ascontiguousarray(bits, dtype=np.uint8), nblocks, out)
    assert n > 0
    return out[: nblocks * n]


def block_decode(outer: int, coded: np.ndarray, n: int) -> np.ndarray:
    nblocks = len(coded) // n
    out = np.zeros(nblocks * 64, dtype=np.uint8)
    k = lib().golden_block_decode(outer, np.ascontiguousarray(coded, dtype=np.uint8), nblocks, out)
    assert k > 0
    return out[: nblocks * k]


def conv_encode(inner: int, bits: np.ndarray) -> np.ndarray:
    out = np.zeros(2 * (len(bits) + 6) + 16, dtype=np.uint8)
    n = lib().golden_conv_encode(inner, np.ascontiguousarray(bits, dtype=np.uint8), len(bits), out)
    return out[:n]


def viterbi_decode(inner: int, coded: np.ndarray, nbits: int) -> np.ndarray:
    out = np.zeros(nbits, dtype=np.uint8)
    lib().golden_viterbi_decode(
        inner, np.ascontiguousarray(coded, dtype=np.uint8), len(coded), nbits, out
    )
    return out


def rs_encode_block(msg: np.ndarray) -> np.ndarray:
    out = np.zeros(len(msg) + 32, dtype=np.uint8)
    lib().golden_rs_encode_block(np.ascontiguousarray(msg, dtype=np.uint8), len(msg), out)
    return out


def rs_decode_block(code: np.ndarray, k: int) -> np.ndarray:
    out = np.zeros(k, dtype=np.uint8)
    lib().golden_rs_decode_block(np.ascontiguousarray(code, dtype=np.uint8), k, out)
    return out
