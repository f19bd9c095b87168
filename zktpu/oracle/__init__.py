"""Independent host C++ field oracle for cross-implementation checks.

The reference validates against arkworks; this build environment has no Rust,
so known-answer vectors are re-derived through a second, independent native
implementation (plain-bigint C++ with shift-subtract reduction -- nothing
shared with the Montgomery limb kernels it checks). See SURVEY.md section 7,
cross-cutting hard part (d).

All values are canonical Python ints; fields are identified by their modulus.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libzkoracle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_HERE, "_oracle.cpp")
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    cint = ctypes.c_int
    for name in ("f_add", "f_sub", "f_mul", "f_pow"):
        getattr(lib, name).argtypes = [u64p, u64p, u64p, cint, u64p]
    lib.f_sum.argtypes = [u64p, ctypes.c_size_t, u64p, cint, u64p]
    lib.f_fold.argtypes = [u64p, ctypes.c_size_t, u64p, u64p, cint, u64p]
    _lib = lib
    return lib


def _words(p: int) -> int:
    return (p.bit_length() + 63) // 64


def _enc(value: int, w: int):
    return (ctypes.c_uint64 * w)(*[(value >> (64 * i)) & ((1 << 64) - 1) for i in range(w)])


def _enc_vec(values, w: int):
    n = len(values)
    arr = (ctypes.c_uint64 * (w * n))()
    for k, v in enumerate(values):
        for i in range(w):
            arr[w * k + i] = (v >> (64 * i)) & ((1 << 64) - 1)
    return arr


def _dec(arr, w: int) -> int:
    return sum(int(arr[i]) << (64 * i) for i in range(w))


def _binop(name: str, a: int, b: int, p: int) -> int:
    w = _words(p)
    out = (ctypes.c_uint64 * w)()
    getattr(_load(), name)(_enc(a % p, w), _enc(b % p, w), _enc(p, w), w, out)
    return _dec(out, w)


def add(a: int, b: int, p: int) -> int:
    return _binop("f_add", a, b, p)


def sub(a: int, b: int, p: int) -> int:
    return _binop("f_sub", a, b, p)


def mul(a: int, b: int, p: int) -> int:
    return _binop("f_mul", a, b, p)


def pow_(a: int, e: int, p: int) -> int:
    w = _words(p)
    out = (ctypes.c_uint64 * w)()
    _load().f_pow(_enc(a % p, w), _enc(e, w), _enc(p, w), w, out)
    return _dec(out, w)


def inverse(a: int, p: int) -> int:
    return pow_(a, p - 2, p)


def vec_sum(values, p: int) -> int:
    w = _words(p)
    out = (ctypes.c_uint64 * w)()
    vec = _enc_vec([v % p for v in values], w)
    _load().f_sum(vec, len(values), _enc(p, w), w, out)
    return _dec(out, w)


def sumcheck_fold(values, r: int, p: int) -> list[int]:
    """Reference fold a + r*(b - a) over table halves (partial_evaluate)."""
    w = _words(p)
    n = len(values)
    vec = _enc_vec([v % p for v in values], w)
    out = (ctypes.c_uint64 * (w * (n // 2)))()
    _load().f_fold(vec, n, _enc(r % p, w), _enc(p, w), w, out)
    return [sum(int(out[w * k + i]) << (64 * i) for i in range(w)) for k in range(n // 2)]
