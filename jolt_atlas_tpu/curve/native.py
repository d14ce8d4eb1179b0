"""ctypes bindings for the native C++ MSM engine (csrc/msm.cpp).

Auto-compiles the shared library on first use if missing (g++ -O3). Falls
back cleanly to the Python Pippenger when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .points import G1

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    csrc = os.path.join(_repo_root(), "csrc")
    so = os.path.join(csrc, "libmsm.so")
    src = os.path.join(csrc, "msm.cpp")
    if not os.path.exists(so) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                 "-o", so, src], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.msm_g1.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_char_p]
        lib.msm_g1.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def msm_native(bases: list[G1], scalars, c: int = 0) -> G1 | None:
    """Native Pippenger MSM; returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = min(len(bases), len(scalars) if hasattr(scalars, "__len__") else 0)
    if n == 0:
        return G1.identity()
    from ..field.constants import FR_MODULUS
    pts = bytearray(64 * n)
    scs = bytearray(32 * n)
    for i in range(n):
        b = bases[i]
        if not b.infinity:
            pts[i * 64: i * 64 + 32] = b.x.to_bytes(32, "little")
            pts[i * 64 + 32: i * 64 + 64] = b.y.to_bytes(32, "little")
        s = int(scalars[i]) % FR_MODULUS
        scs[i * 32: i * 32 + 32] = s.to_bytes(32, "little")
    out = bytes(64)
    out_inf = bytes(1)
    out_buf = ctypes.create_string_buffer(64)
    inf_buf = ctypes.create_string_buffer(1)
    lib.msm_g1(bytes(pts), bytes(scs), n, c, out_buf, inf_buf)
    if inf_buf.raw[0]:
        return G1.identity()
    x = int.from_bytes(out_buf.raw[:32], "little")
    y = int.from_bytes(out_buf.raw[32:64], "little")
    return G1(x, y)
