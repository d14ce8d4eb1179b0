import random

from jolt_atlas_tpu.field.constants import FR_MODULUS
from jolt_atlas_tpu.field.scalar import Fr
from jolt_atlas_tpu.poly import MLPoly
from jolt_atlas_tpu.commitment import KZGSRS, HyperKZG
from jolt_atlas_tpu.commitment.hyperkzg import HyperKZGProof
from jolt_atlas_tpu.transcripts import Blake2bTranscript

rng = random.Random(31337)


def setup_poly(num_vars):
    coeffs = [Fr(rng.randrange(FR_MODULUS)) for _ in range(1 << num_vars)]
    return coeffs


class TestHyperKZG:
    def test_open_verify_roundtrip(self):
        ell = 4
        srs = KZGSRS.setup(1 << ell)
        coeffs = setup_poly(ell)
        C = HyperKZG.commit(srs, [c.v for c in coeffs])
        point = [Fr(rng.randrange(FR_MODULUS)) for _ in range(ell)]
        y = MLPoly.from_fr_list(coeffs).evaluate(point)

        t = Blake2bTranscript(b"hkzg")
        proof = HyperKZG.open(srs, coeffs, point, t)

        tv = Blake2bTranscript(b"hkzg")
        tv.compare_to(t)
        assert HyperKZG.verify(srs, C, point, y, proof, tv)

    def test_rejects_wrong_eval(self):
        ell = 3
        srs = KZGSRS.setup(1 << ell)
        coeffs = setup_poly(ell)
        C = HyperKZG.commit(srs, [c.v for c in coeffs])
        point = [Fr(rng.randrange(FR_MODULUS)) for _ in range(ell)]
        y = MLPoly.from_fr_list(coeffs).evaluate(point)

        t = Blake2bTranscript(b"hkzg")
        proof = HyperKZG.open(srs, coeffs, point, t)
        tv = Blake2bTranscript(b"hkzg")
        assert not HyperKZG.verify(srs, C, point, y + Fr.one(), proof, tv)

    def test_rejects_tampered_proof(self):
        ell = 3
        srs = KZGSRS.setup(1 << ell)
        coeffs = setup_poly(ell)
        C = HyperKZG.commit(srs, [c.v for c in coeffs])
        point = [Fr(rng.randrange(FR_MODULUS)) for _ in range(ell)]
        y = MLPoly.from_fr_list(coeffs).evaluate(point)
        t = Blake2bTranscript(b"hkzg")
        proof = HyperKZG.open(srs, coeffs, point, t)
        proof.v[0][0] = proof.v[0][0] + Fr.one()
        tv = Blake2bTranscript(b"hkzg")
        assert not HyperKZG.verify(srs, C, point, y, proof, tv)

    def test_rejects_wrong_commitment(self):
        ell = 3
        srs = KZGSRS.setup(1 << ell)
        coeffs = setup_poly(ell)
        point = [Fr(rng.randrange(FR_MODULUS)) for _ in range(ell)]
        y = MLPoly.from_fr_list(coeffs).evaluate(point)
        t = Blake2bTranscript(b"hkzg")
        proof = HyperKZG.open(srs, coeffs, point, t)
        other = setup_poly(ell)
        C_bad = HyperKZG.commit(srs, [c.v for c in other])
        tv = Blake2bTranscript(b"hkzg")
        assert not HyperKZG.verify(srs, C_bad, point, y, proof, tv)

    def test_proof_serialization(self):
        ell = 3
        srs = KZGSRS.setup(1 << ell)
        coeffs = setup_poly(ell)
        C = HyperKZG.commit(srs, [c.v for c in coeffs])
        point = [Fr(rng.randrange(FR_MODULUS)) for _ in range(ell)]
        y = MLPoly.from_fr_list(coeffs).evaluate(point)
        t = Blake2bTranscript(b"hkzg")
        proof = HyperKZG.open(srs, coeffs, point, t)
        data = proof.serialize()
        back, off = HyperKZGProof.deserialize(data)
        assert off == len(data)
        tv = Blake2bTranscript(b"hkzg")
        assert HyperKZG.verify(srs, C, point, y, back, tv)

    def test_srs_serialization(self):
        srs = KZGSRS.setup(8)
        data = srs.serialize()
        back = KZGSRS.deserialize(data)
        assert back.g1_powers == srs.g1_powers
        assert back.g2 == srs.g2 and back.beta_g2 == srs.beta_g2


def test_streaming_commit_matches_dense():
    """StreamingCommitter (reference StreamingCommitmentScheme,
    commitment_scheme.rs:133) over arbitrary chunk splits == one-shot
    commit, including a chunk of negatives and an empty chunk."""
    import numpy as np
    from jolt_atlas_tpu.commitment.kzg import KZGSRS, kzg_commit
    from jolt_atlas_tpu.commitment.scheme import StreamingCommitter

    srs = KZGSRS.setup(1 << 10)
    rng = np.random.default_rng(5)
    coeffs = rng.integers(-1000, 1000, size=1 << 10).astype(np.int64)
    dense = kzg_commit(srs, coeffs)

    sc = StreamingCommitter(srs)
    sc.process(coeffs[:100])
    sc.process(coeffs[100:100])       # empty
    sc.process(coeffs[100:777])
    sc.process(coeffs[777:])
    assert sc.finalize().serialize() == dense.serialize()
