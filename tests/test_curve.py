import random

import numpy as np

from jolt_atlas_tpu.field.constants import FR_MODULUS
from jolt_atlas_tpu.curve import G1, g1_generator, g2_generator, msm, pairing, pairing_check
from jolt_atlas_tpu.curve.fq import FQ2, FQ12
from jolt_atlas_tpu.curve.points import (
    affine_to_jacobian,
    jacobian_add,
    jacobian_double,
    jacobian_to_affine,
)

rng = random.Random(7)


class TestFqTower:
    def test_fq2(self):
        a, b = FQ2(3, 5), FQ2(7, 11)
        assert a * b == b * a
        assert (a * a.inverse()) == FQ2.one()
        assert a * FQ2.one() == a
        # u^2 = -1
        u = FQ2(0, 1)
        assert u * u == FQ2(-1, 0)

    def test_fq12(self):
        a = FQ12(list(range(1, 13)))
        b = FQ12(list(range(13, 25)))
        assert a * b == b * a
        assert (a * a.inverse()).is_one()
        assert (a * b) * b.inverse() == a


class TestGroups:
    def test_g1_group_law(self):
        g = g1_generator()
        assert g.is_on_curve()
        g2 = g + g
        g3a = g2 + g
        g3b = g * 3
        assert g3a == g3b and g3a.is_on_curve()
        assert (g - g).is_zero()
        assert (g * FR_MODULUS).is_zero()  # group order

    def test_g2_group_law(self):
        h = g2_generator()
        assert h.is_on_curve()
        assert (h + h) == h * 2
        assert (h * FR_MODULUS).is_zero()

    def test_jacobian_matches_affine(self):
        g = g1_generator()
        j = affine_to_jacobian(g)
        assert jacobian_to_affine(jacobian_double(j)) == g + g
        assert jacobian_to_affine(jacobian_add(j, jacobian_double(j))) == g * 3

    def test_serialization(self):
        p = g1_generator() * 12345
        assert G1.deserialize(p.serialize()) == p
        assert G1.deserialize(G1.identity().serialize()).is_zero()


class TestMSM:
    def test_msm_small(self):
        g = g1_generator()
        bases = [g * i for i in range(1, 9)]
        scalars = [rng.randrange(1 << 16) for _ in range(8)]
        want = G1.identity()
        for s, b in zip(scalars, bases):
            want = want + b * s
        assert msm(bases, scalars) == want

    def test_msm_dtypes_and_edgecases(self):
        g = g1_generator()
        bases = [g * (i + 1) for i in range(5)]
        # numpy u16 scalars
        scalars = np.array([0, 1, 65535, 7, 0], dtype=np.uint16)
        want = G1.identity()
        for s, b in zip(scalars, bases):
            want = want + b * int(s)
        assert msm(bases, scalars) == want
        # all-zero
        assert msm(bases, [0] * 5).is_zero()
        # big scalars
        big = [rng.randrange(FR_MODULUS) for _ in range(5)]
        want = G1.identity()
        for s, b in zip(big, bases):
            want = want + b * s
        assert msm(bases, big) == want


class TestPairing:
    def test_bilinearity(self):
        p, q = g1_generator(), g2_generator()
        e_ab = pairing(p * 3, q * 5)
        e_base = pairing(p, q)
        assert e_ab == e_base**15
        assert pairing(p * 2, q) == pairing(p, q * 2)

    def test_nondegeneracy_and_identity(self):
        p, q = g1_generator(), g2_generator()
        assert not pairing(p, q).is_one()
        assert pairing(G1.identity(), q).is_one()

    def test_pairing_check(self):
        p, q = g1_generator(), g2_generator()
        # e(2P, Q) * e(-P, 2Q) == 1  since e(2P,Q) = e(P,Q)^2 = e(P,2Q)
        assert pairing_check([(p * 2, q), (-(p), q * 2)])
        assert not pairing_check([(p, q), (p, q)])


def test_native_pairing_matches_python_oracle():
    """csrc bn_pairing_product == the Python flat-FQ12 pairing, full
    coefficient match on a nontrivial product, plus bilinearity checks."""
    from jolt_atlas_tpu.curve import native
    if native._load() is None:
        import pytest
        pytest.skip("native lib unavailable")
    from jolt_atlas_tpu.curve.points import g1_generator, g2_generator
    import importlib
    pr = importlib.import_module("jolt_atlas_tpu.curve.pairing")

    g, h = g1_generator(), g2_generator()
    a, b = 0x1234567, 0x89ABCD
    P1, Q1 = g * a, h * b
    # bilinearity: e(aG, bH) e(-abG, H) == 1 through the native path
    assert pr._pairing_product_native([(P1, Q1), (-(g * (a * b)), h)])[0] == 1
    # tampered: e(aG, bH) e(-(ab+1)G, H) != 1
    res = pr._pairing_product_native([(P1, Q1), (-(g * (a * b + 1)), h)])
    assert not (res[0] == 1 and all(c == 0 for c in res[1:]))
    # full Fq12 coefficient match vs the Python construction
    py = (pr.miller_loop(pr.twist(Q1), pr._g1_to_fq12(P1))
          * pr.miller_loop(pr.twist(h), pr._g1_to_fq12(g))) ** pr._FINAL_EXP
    assert list(py.c) == pr._pairing_product_native([(P1, Q1), (g, h)])
    # infinity pairs are skipped
    from jolt_atlas_tpu.curve.points import G1
    assert pr.pairing_check([(G1.identity(), h)])
