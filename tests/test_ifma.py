"""AVX-512 IFMA engine regression tests (csrc/mont52.h).

Differential against Python bigint arithmetic; skipped on hosts without
avx512ifma (the kernels then fall back to the scalar ADX paths, which
the rest of the suite covers)."""

import ctypes
import os
import random

import numpy as np
import pytest

from jolt_atlas_tpu.field import frvec
from jolt_atlas_tpu.field.constants import FR_MODULUS as R
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.field.frvec import FrArray, _fr_limbs


def _lib():
    lib = frvec._load()
    if lib is None:
        pytest.skip("native library unavailable")
    lib.frv52_available.restype = ctypes.c_int
    if not lib.frv52_available():
        pytest.skip("no avx512ifma on this host")
    lib.frv52_mul.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64] * 2
    lib.frv52_chain.argtypes = [ctypes.c_void_p] * 6 + [ctypes.c_int64]
    return lib


def test_mul8_matches_bigint():
    lib = _lib()
    rng = random.Random(0x1f)
    n = 64
    av = [rng.randrange(R) for _ in range(n)]
    bv = [rng.randrange(R) for _ in range(n)]
    # edge values in a few lanes
    av[:4] = [0, 1, R - 1, (1 << 52) - 1]
    bv[:4] = [R - 1, R - 1, R - 1, 1]
    a = np.frombuffer(b"".join(v.to_bytes(32, "little") for v in av),
                      dtype=np.uint64).reshape(n, 4).copy()
    b = np.frombuffer(b"".join(v.to_bytes(32, "little") for v in bv),
                      dtype=np.uint64).reshape(n, 4).copy()
    out = np.empty_like(a)
    lib.frv52_mul(a.ctypes.data, b.ctypes.data, out.ctypes.data, n, 1)
    inv260 = pow(1 << 260, -1, R)
    for i in range(n):
        got = int.from_bytes(out[i].tobytes(), "little")
        assert got == av[i] * bv[i] * inv260 % R, i


def test_bind_chain_matches_fr():
    lib = _lib()
    rng = random.Random(0x2e)
    n = 64
    A = FrArray.from_fr_list([Fr(rng.randrange(R)) for _ in range(n)])
    B = FrArray.from_fr_list([Fr(rng.randrange(R)) for _ in range(n)])
    c = Fr(rng.randrange(R))
    osub = np.empty((n, 4), np.uint64)
    omul = np.empty_like(osub)
    oout = np.empty_like(osub)
    lib.frv52_chain(A.d.ctypes.data, B.d.ctypes.data,
                    _fr_limbs(c).ctypes.data, osub.ctypes.data,
                    omul.ctypes.data, oout.ctypes.data, n)
    Af, Bf = A.to_fr_list(), B.to_fr_list()
    gs = FrArray(osub).to_fr_list()
    gm = FrArray(omul).to_fr_list()
    go = FrArray(oout).to_fr_list()
    for i in range(n):
        d = Bf[i] - Af[i]
        assert gs[i].v == d.v
        assert gm[i].v == (c * d).v
        assert go[i].v == (Af[i] + c * d).v


def test_gruen_rounds_match_scalar_engine():
    """Byte-level: the same instance proven with and without IFMA (via the
    kill switch in a subprocess) yields identical round messages."""
    import json
    import subprocess
    import sys
    code = (
        "import numpy as np, sys, random, json\n"
        "sys.path.insert(0, %r)\n"
        "from jolt_atlas_tpu.field.scalar import Fr\n"
        "from jolt_atlas_tpu.field.frvec import FrArray, GruenInstance\n"
        "from jolt_atlas_tpu.poly.spliteq import SplitEq\n"
        "R = 1 << 254\n"
        "out = []\n"
        "for P, nv, deg, seed in [(1,6,2,1),(2,7,3,2),(3,8,4,3),(5,6,6,4)]:\n"
        "    rr = random.Random(seed)\n"
        "    n = 1 << nv\n"
        "    rows = [FrArray.from_fr_list([Fr(rr.randrange(R))\n"
        "            for _ in range(n)]) for _ in range(P)]\n"
        "    terms = [(Fr(1), list(range(P))), (Fr(3), [0])]\n"
        "    g = GruenInstance(rows, terms, deg)\n"
        "    se = SplitEq([Fr(rr.randrange(1 << 120)) for _ in range(nv)])\n"
        "    vals = []\n"
        "    for rnd in range(nv):\n"
        "        whi, sh, wlo, lw = se.tables(rnd)\n"
        "        pts = g.round_points(max(1, deg - 1), whi, sh, wlo, lw)\n"
        "        vals.append([x.v for x in pts.to_fr_list()])\n"
        "        c = Fr(rr.randrange(1 << 125))\n"
        "        g.bind(c)\n"
        "        se.note_challenge(c, rnd)\n"
        "    out.append(vals)\n"
        "print(json.dumps(out))\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    env = dict(os.environ)
    env.pop("JOLT_ATLAS_NO_IFMA", None)
    r1 = subprocess.run([sys.executable, "-c", code], capture_output=True,
                        text=True, env=env, timeout=300)
    env["JOLT_ATLAS_NO_IFMA"] = "1"
    r2 = subprocess.run([sys.executable, "-c", code], capture_output=True,
                        text=True, env=env, timeout=300)
    assert json.loads(r1.stdout) == json.loads(r2.stdout)
