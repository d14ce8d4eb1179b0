"""Bit-exactness of the device transcript/field kernels against host
oracles: tpu/blake2b.py vs hashlib, tpu/fqplanes.py vs Python big-int.

These are the building blocks of the device-resident opening reduction
(tpu/reduction.py); any drift here would silently fork the Fiat-Shamir
transcript (caught later only by the state assertion)."""

import hashlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from jolt_atlas_tpu.field.constants import FR_MODULUS  # noqa: E402
from jolt_atlas_tpu.tpu import blake2b as B  # noqa: E402
from jolt_atlas_tpu.tpu.fqplanes import PlanesCtx  # noqa: E402

rng = np.random.default_rng(0xB2B)


def _pairs(data: bytes):
    w = np.frombuffer(data, dtype="<u4")
    return [(jnp.uint32(w[2 * i]), jnp.uint32(w[2 * i + 1]))
            for i in range(len(w) // 2)]


def _unpairs(pairs) -> bytes:
    out = []
    for lo, hi in pairs:
        out.append(int(lo))
        out.append(int(hi))
    return np.array(out, dtype="<u4").tobytes()


class TestBlake2b:
    def test_absorb_matches_hashlib(self):
        for _ in range(4):
            state = rng.bytes(32)
            payload = rng.bytes(32)
            n = int(rng.integers(0, 2**31))
            msg = state + b"\x00" * 28 + n.to_bytes(4, "big") + payload
            want = hashlib.blake2b(msg, digest_size=32).digest()
            got = B.transcript_absorb(
                _pairs(state), jnp.uint32(n), _pairs(payload))
            assert _unpairs(got) == want

    def test_squeeze_matches_hashlib(self):
        for _ in range(4):
            state = rng.bytes(32)
            n = int(rng.integers(0, 2**31))
            msg = state + b"\x00" * 28 + n.to_bytes(4, "big")
            want = hashlib.blake2b(msg, digest_size=32).digest()
            got = B.transcript_squeeze(_pairs(state), jnp.uint32(n))
            assert _unpairs(got) == want


class TestFqPlanes:
    def test_mont_mul_matches_bigint(self):
        FR = PlanesCtx(FR_MODULUS)
        n = 64
        a = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62))
             % FR_MODULUS for _ in range(n)]
        b = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62))
             % FR_MODULUS for _ in range(n)]
        pa = jnp.asarray(FR.to_planes(a))
        pb = jnp.asarray(FR.to_planes(b))
        prod = FR.from_planes(np.asarray(FR.mul(pa, pb)))
        for x, y, z in zip(a, b, prod):
            assert z == x * y % FR_MODULUS

    def test_add_sub_match_bigint(self):
        FR = PlanesCtx(FR_MODULUS)
        n = 32
        a = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62))
             % FR_MODULUS for _ in range(n)]
        b = [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62))
             % FR_MODULUS for _ in range(n)]
        pa = jnp.asarray(FR.to_planes(a))
        pb = jnp.asarray(FR.to_planes(b))
        s = FR.from_planes(np.asarray(FR.add(pa, pb)))
        d = FR.from_planes(np.asarray(FR.sub(pa, pb)))
        for x, y, sv, dv in zip(a, b, s, d):
            assert sv == (x + y) % FR_MODULUS
            assert dv == (x - y) % FR_MODULUS
