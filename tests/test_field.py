import random

import numpy as np
import jax.numpy as jnp

from jolt_atlas_tpu.field.constants import FR_MODULUS
from jolt_atlas_tpu.field.scalar import Fr, batch_inverse
from jolt_atlas_tpu.field import jaxfr

R = FR_MODULUS
rng = random.Random(0xA71A5)


def rand_ints(n):
    return [rng.randrange(R) for _ in range(n)]


class TestScalarFr:
    def test_basic_ops(self):
        a, b = Fr(12345), Fr(R - 7)
        assert (a + b).v == (12345 + R - 7) % R
        assert (a - b).v == (12345 - (R - 7)) % R
        assert (a * b).v == (12345 * (R - 7)) % R
        assert (-a).v == R - 12345

    def test_inverse(self):
        for v in rand_ints(10):
            a = Fr(v)
            assert (a * a.inverse()).is_one()

    def test_batch_inverse(self):
        elems = [Fr(v) for v in rand_ints(33)]
        invs = batch_inverse(elems)
        for e, i in zip(elems, invs):
            assert (e * i).is_one()

    def test_serialization_roundtrip(self):
        a = Fr(rng.randrange(R))
        assert Fr.from_bytes_le(a.to_bytes_le()) == a
        assert len(a.to_bytes_le()) == 32

    def test_challenge_125bit(self):
        # value v masked to 125 bits, canonical = v * 2^-128 mod r
        v = (1 << 127) | 12345  # top bits masked off
        c = Fr.from_u128_challenge(v)
        masked = v & ((1 << 125) - 1)
        assert (c * Fr(1 << 128)).v == masked


class TestJaxFr:
    def test_roundtrip(self):
        vals = rand_ints(17)
        limbs = jaxfr.to_limbs_host(vals)
        back = jaxfr.from_limbs_host(limbs)
        assert back == vals

    def test_mont_mul(self):
        n = 64
        a_vals, b_vals = rand_ints(n), rand_ints(n)
        a = jnp.asarray(jaxfr.to_limbs_host(a_vals))
        b = jnp.asarray(jaxfr.to_limbs_host(b_vals))
        got = jaxfr.from_limbs_host(np.asarray(jaxfr.mont_mul_jit(a, b)))
        want = [(x * y) % R for x, y in zip(a_vals, b_vals)]
        assert got == want

    def test_add_sub_neg(self):
        n = 64
        a_vals, b_vals = rand_ints(n), rand_ints(n)
        a = jnp.asarray(jaxfr.to_limbs_host(a_vals))
        b = jnp.asarray(jaxfr.to_limbs_host(b_vals))
        assert jaxfr.from_limbs_host(np.asarray(jaxfr.add(a, b))) == [
            (x + y) % R for x, y in zip(a_vals, b_vals)
        ]
        assert jaxfr.from_limbs_host(np.asarray(jaxfr.sub(a, b))) == [
            (x - y) % R for x, y in zip(a_vals, b_vals)
        ]
        assert jaxfr.from_limbs_host(np.asarray(jaxfr.neg(a))) == [
            (-x) % R for x in a_vals
        ]

    def test_relaxed_invariant_chains(self):
        # long chains of muls/adds must stay consistent (invariant < 2r)
        n = 8
        vals = rand_ints(n)
        a = jnp.asarray(jaxfr.to_limbs_host(vals))
        acc = a
        expect = list(vals)
        for i in range(6):
            acc = jaxfr.mont_mul_jit(acc, a) if i % 2 == 0 else jaxfr.add_jit(acc, acc)
            expect = (
                [(x * y) % R for x, y in zip(expect, vals)]
                if i % 2 == 0
                else [(2 * x) % R for x in expect]
            )
        assert jaxfr.from_limbs_host(np.asarray(acc)) == expect

    def test_from_signed_ints(self):
        xs = np.array([0, 1, -1, 2**31 - 1, -(2**31) + 1, 123456, -654321],
                      dtype=np.int32)
        limbs = jaxfr.from_signed_ints(jnp.asarray(xs), bits=32)
        got = jaxfr.from_limbs_host(np.asarray(limbs))
        assert got == [int(x) % R for x in xs]

    def test_from_signed_ints_64(self):
        xs = np.array([0, 2**40 + 7, -(2**50) - 3, 2**62, -1], dtype=np.int64)
        limbs = jaxfr.from_signed_ints(jnp.asarray(xs), bits=64)
        got = jaxfr.from_limbs_host(np.asarray(limbs))
        assert got == [int(x) % R for x in xs]

    def test_sum_reduce_and_dot(self):
        n = 33
        a_vals, b_vals = rand_ints(n), rand_ints(n)
        a = jnp.asarray(jaxfr.to_limbs_host(a_vals))
        b = jnp.asarray(jaxfr.to_limbs_host(b_vals))
        s = jaxfr.from_limbs_host(np.asarray(jaxfr.sum_reduce(a)))[0]
        assert s == sum(a_vals) % R
        d = jaxfr.from_limbs_host(np.asarray(jaxfr.dot(a, b)))[0]
        assert d == sum(x * y for x, y in zip(a_vals, b_vals)) % R

    def test_to_canonical(self):
        vals = rand_ints(16)
        a = jnp.asarray(jaxfr.to_limbs_host(vals))
        canon = np.asarray(jaxfr.to_canonical(a), dtype=np.uint64)
        for row, v in zip(canon, vals):
            acc = 0
            for i, limb in enumerate(row):
                acc |= int(limb) << (16 * i)
            assert acc == v
